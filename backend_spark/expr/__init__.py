from backend_spark.expr.compiler import CompileError, compile_expr, eval_expr_column

__all__ = ["compile_expr", "eval_expr_column", "CompileError"]
