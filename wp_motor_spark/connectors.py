"""v2 unified connector registry + source config parser (reference:
src/sources/ SourceConfigParser, tests/sources_unified_config.rs,
connectors/{source.d,sink.d}/*.toml).

The v2 config generation splits "how to reach a system" (a connector:
`[[connectors]]` with id/type/params/allow_override) from "what this
pipeline consumes" (`[[sources]]` with connect = "<id>" +
params_override). Connector TOMLs live in `connectors/source.d/` and
`connectors/sink.d/`, found by searching UPWARD from the work dir (the
reference resolves them the same way so one machine-level registry can
serve many instance workspaces).

Contract mirrored from sources_unified_config.rs:
- validate-only parses `[[sources]]` WITHOUT resolving connectors:
  specs keep an empty kind/params (so syntax can be checked on a box
  that lacks the registry).
- build REQUIRES the connector: a missing id raises
  ``ConnectorNotFound`` ("connector not found").
- ``params_override`` keys must be a subset of the connector's
  ``allow_override`` whitelist; anything else raises
  ``OverrideNotAllowed``.
- file connectors accept either ``path`` or ``base`` + ``file``.
"""

from __future__ import annotations

import glob
import os
import tomllib
from dataclasses import dataclass, field


class ConnectorNotFound(KeyError):
    def __init__(self, connect_id: str):
        super().__init__(f"connector not found: {connect_id}")
        self.connect_id = connect_id


class OverrideNotAllowed(ValueError):
    # message shape pinned by orchestrator/config/loader/mod.rs
    # test_wpgen_resolved_override_not_allowed: the error must name the
    # key as "override '<key>' not allowed"
    def __init__(self, connect_id: str, keys: list[str]):
        named = ", ".join(f"override {k!r} not allowed" for k in keys)
        super().__init__(
            f"connector {connect_id!r}: {named} (allow_override whitelist)"
        )


@dataclass
class Connector:
    id: str
    type: str
    params: dict = field(default_factory=dict)
    allow_override: list[str] = field(default_factory=list)

    def resolve(self, params_override: dict | None) -> dict:
        """Connector params + whitelisted overrides -> effective params."""
        override = dict(params_override or {})
        bad = sorted(k for k in override if k not in self.allow_override)
        if bad:
            raise OverrideNotAllowed(self.id, bad)
        out = dict(self.params)
        out.update(override)
        return out


@dataclass
class CoreSourceSpec:
    """validate-only output (CoreSourceSpec in the reference): the
    source rows as declared, connector unresolved."""

    name: str
    connect: str
    enable: bool = True
    kind: str = ""
    params: dict = field(default_factory=dict)
    tags: list[str] = field(default_factory=list)


@dataclass
class BuiltSource:
    """build output: connector resolved, whitelist enforced."""

    name: str
    kind: str
    params: dict
    enable: bool
    tags: list[str]

    @property
    def path(self) -> str | None:
        """file connectors: `path`, or `base` + `file` composed."""
        p = self.params.get("path")
        if p:
            return p
        base, fname = self.params.get("base"), self.params.get("file")
        if base and fname:
            return os.path.join(base, fname)
        return None


class ConnectorRegistry:
    def __init__(self, connectors: dict[str, Connector]):
        self.connectors = connectors

    @classmethod
    def load(cls, work_dir: str, kind: str) -> "ConnectorRegistry | None":
        """Search `work_dir` then its ancestors for connectors/<kind>.d/
        (kind: "source" or "sink"); None when no registry dir exists."""
        d = os.path.abspath(work_dir)
        while True:
            cdir = os.path.join(d, "connectors", f"{kind}.d")
            if os.path.isdir(cdir):
                return cls._from_dir(cdir)
            parent = os.path.dirname(d)
            if parent == d:
                return None
            d = parent

    @classmethod
    def _from_dir(cls, cdir: str) -> "ConnectorRegistry":
        connectors: dict[str, Connector] = {}
        for p in sorted(glob.glob(os.path.join(cdir, "*.toml"))):
            with open(p, "rb") as fh:
                doc = tomllib.load(fh)
            for c in doc.get("connectors", []):
                connectors[c["id"]] = Connector(
                    id=c["id"],
                    type=c.get("type", "file"),
                    params=dict(c.get("params", {})),
                    allow_override=list(c.get("allow_override", [])),
                )
        return cls(connectors)

    def get(self, connect_id: str) -> Connector:
        if connect_id not in self.connectors:
            raise ConnectorNotFound(connect_id)
        return self.connectors[connect_id]


class SourceConfigParser:
    """v2 `[[sources]]` parser rooted at a work dir (the reference's
    SourceConfigParser::new(work))."""

    def __init__(self, work_dir: str):
        self.work_dir = work_dir

    @staticmethod
    def _sources(cfg_text: str) -> list[dict]:
        return tomllib.loads(cfg_text).get("sources", [])

    def parse_and_validate_only(self, cfg_text: str) -> list[CoreSourceSpec]:
        """Syntax/shape check only — connectors are NOT resolved, so kind
        and params stay empty (works without a registry on disk)."""
        return [
            CoreSourceSpec(
                name=s["key"],
                connect=s.get("connect", ""),
                enable=bool(s.get("enable", True)),
                tags=list(s.get("tags", [])),
            )
            for s in self._sources(cfg_text)
        ]

    def parse_and_build(self, cfg_text: str) -> list[BuiltSource]:
        """Resolve each enabled source against the connector registry,
        enforcing the allow_override whitelist."""
        registry = ConnectorRegistry.load(self.work_dir, "source")
        built: list[BuiltSource] = []
        for s in self._sources(cfg_text):
            if not s.get("enable", True):
                continue
            if registry is None:
                raise ConnectorNotFound(s.get("connect", "<none>"))
            conn = registry.get(s["connect"])
            built.append(
                BuiltSource(
                    name=s["key"],
                    kind=conn.type,
                    params=conn.resolve(s.get("params_override")),
                    enable=True,
                    tags=list(s.get("tags", [])),
                )
            )
        return built
