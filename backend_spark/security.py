"""Auth layer mirroring the reference's security model
(code/security.py; wired via ``@login_required`` / ``@authorize`` in
code/api.py): users with passwords, groups mapping projects to
role-to-user assignments, roles granting CRUD rights, and a global
``no_auth`` switch that turns the whole layer off.

The reference rides flask-login sessions + OAuth providers; here the
transport is stateless — HTTP Basic (same check_password semantics)
plus Bearer tokens (the post-OAuth credential shape: a provider's
sign-in ends in a token the API maps to a user; the provider-redirect
dance itself, code/oauth.py, is network transport glue out of scope
for an engine library, SURVEY.md §3).  The rights walk is a faithful
re-expression of ``check_rights`` / ``check_rights_groups``
(code/security.py:16-47): a user holds a right on a project when any
group grants it via a role, with ``_all`` wildcards on both the project
and the user axis.
"""

from __future__ import annotations

import base64
import binascii
from dataclasses import dataclass, field

RIGHTS = ("create", "read", "update", "delete")


@dataclass
class SecurityConf:
    """The ``users`` / ``groups`` / ``roles`` conf sections (same YAML
    shape as the reference's conf tree) plus the ``no_auth`` switch
    (reference reads it at conf["global"]["api"]["no_auth"])."""

    users: dict = field(default_factory=dict)    # name -> {"password": ..., "tokens": [...]}
    groups: dict = field(default_factory=dict)   # name -> {"projects": {proj: {role: user|{user:...}}}}
    roles: dict = field(default_factory=dict)    # name -> {right: bool}
    tokens: dict = field(default_factory=dict)   # token -> user (top-level section)
    no_auth: bool = False

    @classmethod
    def from_conf(cls, conf: dict) -> "SecurityConf":
        no_auth = bool(
            (conf.get("global", {}).get("api", {}) or {}).get("no_auth", False)
        )
        users = conf.get("users", {}) or {}
        # token table: top-level `tokens: {token: user}` plus per-user
        # `tokens: [...]` lists, merged (top-level wins on collision)
        tokens: dict = {}
        for name, u in users.items():
            for t in (u or {}).get("tokens", []) or []:
                tokens[str(t)] = name
        tokens.update({str(t): u for t, u in (conf.get("tokens", {}) or {}).items()})
        return cls(
            users=users,
            groups=conf.get("groups", {}) or {},
            roles=conf.get("roles", {}) or {},
            tokens=tokens,
            no_auth=no_auth,
        )

    def role_right(self, role: str, right: str) -> bool:
        # reference Role: missing key -> False (code/security.py:125-136)
        return bool((self.roles.get(role) or {}).get(right, False))

    def check_rights(self, user: str, project: str, right: str) -> bool:
        """True when any group grants ``right`` on ``project`` to
        ``user`` — the reference's nested walk with ``_all`` wildcards
        on the project and user axes (code/security.py:16-47)."""
        if self.no_auth:
            return True
        for group in self.groups.values():
            projects = (group or {}).get("projects", {}) or {}
            for p in ("_all", project):
                for role, assigned in (projects.get(p) or {}).items():
                    # assignment is either {user: ...} or a bare user name
                    names = (
                        list(assigned.keys()) if isinstance(assigned, dict) else [assigned]
                    )
                    if ("_all" in names or user in names) and self.role_right(role, right):
                        return True
        return False

    def check_password(self, user: str, password: str) -> bool:
        # reference User.check_password is a plain compare
        # (code/security.py:115-116); a None password never matches
        stored = (self.users.get(user) or {}).get("password")
        return stored is not None and stored == password

    def authenticate_basic(self, authorization: str | None) -> str | None:
        """Resolve an ``Authorization: Basic ...`` header to a user name,
        or None when absent/malformed/wrong-password."""
        if not authorization or not authorization.startswith("Basic "):
            return None
        try:
            raw = base64.b64decode(authorization[6:], validate=True).decode("utf-8")
        except (binascii.Error, UnicodeDecodeError):
            return None
        user, sep, password = raw.partition(":")
        if not sep or user not in self.users:
            return None
        return user if self.check_password(user, password) else None

    def authenticate_bearer(self, authorization: str | None) -> str | None:
        """Resolve an ``Authorization: Bearer <token>`` header to a user
        name via the token table — the stateless equivalent of the
        reference's post-OAuth session (a signed-in identity carried by
        a credential, not a password).  Unknown/absent token -> None;
        a token mapped to a user absent from ``users`` -> None (revoking
        the user revokes every token)."""
        if not authorization or not authorization.startswith("Bearer "):
            return None
        user = self.tokens.get(authorization[7:].strip())
        return user if user is not None and user in self.users else None

    def authenticate(self, authorization: str | None) -> str | None:
        """Scheme dispatch: Basic (password) or Bearer (token)."""
        if authorization and authorization.startswith("Bearer "):
            return self.authenticate_bearer(authorization)
        return self.authenticate_basic(authorization)
