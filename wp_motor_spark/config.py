"""Workspace config loader: the reference's TOML project layout -> Pipeline.

Reference layout (tests/instance/, loaded by src/orchestrator/config/
models.rs via WpApp::try_from — SURVEY.md §3.1 step 1):

    conf/wparse.toml          engine conf: model dirs, topology dirs,
                              parallel, speed_limit, stat windows
    wpl/**/*.wpl              parse rules (packages)
    oml/*.oml                 transform models
    topology/sources/*.toml   [[source_file]] / [[source_kafka]] /
                              [[source_syslog]] with enable + tags
    topology/sinks/*.toml     [sink_group] data sinks (v1: fmt/target/path)
    topology/sinks/infra.d/   default/miss/error/residue/monitor groups
                              (v2: use = file_raw_sink, params {base,file})

`load_workspace` parses all of it; `build_pipeline` assembles the runnable
Pipeline plus the enabled batch input paths.
"""

from __future__ import annotations

import glob
import os
import tomllib
from dataclasses import dataclass, field

from wp_motor_spark.sinks.spec import SinkSpec

_INFRA = {"default", "miss", "error", "residue", "monitor", "intercept"}


@dataclass
class SourceSpec:
    key: str
    kind: str  # file | kafka | syslog
    path: str | None = None
    enable: bool = True
    tags: dict[str, str] = field(default_factory=dict)
    options: dict = field(default_factory=dict)


@dataclass
class Workspace:
    root: str
    conf: dict = field(default_factory=dict)
    wpl_texts: list[str] = field(default_factory=list)
    oml_texts: list[str] = field(default_factory=list)
    sources: list[SourceSpec] = field(default_factory=list)
    sinks: list[SinkSpec] = field(default_factory=list)

    @property
    def parallel(self) -> int:
        return int(self.conf.get("parallel", 2))

    @property
    def robust(self) -> str:
        """Error-handling strategy (01-wparse.md: robust = debug|normal|
        strict; wp-error sys_robust_mode)."""
        return str(self.conf.get("robust", "normal"))

    @property
    def speed_limit(self) -> int:
        return int(self.conf.get("speed_limit", 10000))

    @property
    def stat_window_sec(self) -> int:
        return int(self.conf.get("stat", {}).get("window_sec", 60))

    @property
    def stat_specs(self) -> dict[str, list[dict]]:
        """[[stat.pick/parse/sink]] collector declarations (wparse.toml
        [stat] tables; wp-stats collector config): per-stage key/target
        glob/dimension fields/top_n, feeding operators.stats
        windowed_counts."""
        st = self.conf.get("stat", {})
        out: dict[str, list[dict]] = {}
        for stage in ("pick", "parse", "sink"):
            out[stage] = [
                {
                    "key": s.get("key", f"{stage}_stat"),
                    "target": s.get("target", "*"),
                    "fields": list(s.get("fields", [])),
                    "top_n": int(s.get("top_n", 20)),
                }
                for s in st.get(stage, [])
            ]
        return out


def _parse_tags(tags: list[str]) -> dict[str, str]:
    out = {}
    for t in tags or []:
        k, _, v = t.partition(":")
        if k.strip():
            out[k.strip()] = v.strip()
    return out


def _toml(path: str) -> dict:
    with open(path, "rb") as f:
        return tomllib.load(f)


def load_workspace(root: str, out_root: str | None = None) -> Workspace:
    """Parse a reference-layout workspace. ``out_root``, when given,
    rebases every sink's relative output path (tests never write into the
    workspace)."""
    ws = Workspace(root=root)
    conf_path = os.path.join(root, "conf", "wparse.toml")
    if os.path.exists(conf_path):
        ws.conf = _toml(conf_path)

    models = ws.conf.get("models", {})
    wpl_dir = os.path.join(root, models.get("wpl", "wpl"))
    oml_dir = os.path.join(root, models.get("oml", "oml"))
    topo = ws.conf.get("topology", {})
    src_dir = os.path.join(root, topo.get("sources", "topology/sources"))
    sink_dir = os.path.join(root, topo.get("sinks", "topology/sinks"))

    # WPL: parse.wpl files take priority; other .wpl (e.g. gen_rule.wpl
    # generator duals) are skipped when they'd redefine the same rule key
    from wp_motor_spark.wpl.parser import parse_wpl

    seen_keys: set[str] = set()
    paths = sorted(
        glob.glob(os.path.join(wpl_dir, "**", "*.wpl"), recursive=True),
        key=lambda p: (0 if os.path.basename(p) == "parse.wpl" else 1, p),
    )
    for p in paths:
        text = open(p).read()
        try:
            keys = {r.key for r in parse_wpl(text)}
        except Exception:
            continue
        if keys & seen_keys:
            continue
        seen_keys |= keys
        ws.wpl_texts.append(text)

    for p in sorted(glob.glob(os.path.join(oml_dir, "*.oml"))):
        ws.oml_texts.append(open(p).read())

    # sources
    for p in sorted(glob.glob(os.path.join(src_dir, "*.toml"))):
        t = _toml(p)
        # v2 unified sources: [[sources]] connect = "<connector id>" +
        # params_override, resolved against connectors/source.d (upward
        # search from the workspace root; whitelist enforced)
        if t.get("sources"):
            from wp_motor_spark.connectors import SourceConfigParser

            for b in SourceConfigParser(root).parse_and_build(open(p).read()):
                path = b.path
                ws.sources.append(
                    SourceSpec(
                        key=b.name,
                        kind=b.kind,
                        path=os.path.join(root, path)
                        if path and not os.path.isabs(path)
                        else path,
                        enable=b.enable,
                        tags=_parse_tags(b.tags),
                        options={
                            k: v
                            for k, v in b.params.items()
                            if k not in ("path", "base", "file")
                        },
                    )
                )
        for kind in ("file", "kafka", "syslog"):
            for s in t.get(f"source_{kind}", []):
                ws.sources.append(
                    SourceSpec(
                        key=s.get("key", kind),
                        kind=kind,
                        path=os.path.join(root, s["path"]) if s.get("path") else None,
                        enable=bool(s.get("enable", True)),
                        tags=_parse_tags(s.get("tags", [])),
                        options={
                            k: v
                            for k, v in s.items()
                            if k not in ("key", "path", "enable", "tags")
                        },
                    )
                )

    # sinks: data groups + infra groups (both v1 and v2 spellings)
    def rebase(path: str) -> str:
        if out_root is not None:
            return os.path.join(out_root, os.path.basename(path))
        return os.path.join(root, path)

    from wp_motor_spark.connectors import ConnectorRegistry

    sink_registry = ConnectorRegistry.load(root, "sink")

    def add_group(
        name: str, sinks: list[dict], condition: str | None, models: list[str] | None,
        group_expect: dict | None = None,
    ) -> None:
        for s in sinks:
            kind = s.get("target", "file")
            options: dict = {}
            # v2: use/connect = <sink connector id> + params override.
            # Both spellings appear in the reference: `use` in the
            # tests/instance tree, `connect` in the connector docs
            # (05-connectors/02-sinks/*.md).
            use = s.get("use") or s.get("connect")
            if use is not None:
                conn = (
                    sink_registry.connectors.get(use) if sink_registry else None
                )
                if conn is not None:
                    params = conn.resolve(s.get("params"))
                    kind = conn.type if conn.type != "file" else kind
                    fmt = params.get("fmt") or (
                        "raw" if "raw" in use else "json"
                    )
                else:  # no registry on disk: the documented name heuristic
                    params = s.get("params", {})
                    fmt = "raw" if "raw" in use else "json"
                path = rebase(
                    os.path.join(params.get("base", "out"), params.get("file", f"{name}.dat"))
                )
                # Non-file connector targets (victorialogs/kafka/tcp/syslog)
                # read endpoint/brokers/host/port/... from SinkSpec.options at
                # write time — pass every resolved param through except the
                # file-layout keys consumed above.
                options = {
                    k: v for k, v in params.items()
                    if k not in ("base", "file", "fmt")
                }
            else:  # v1: fmt/target/path
                path = rebase(s.get("path", f"out/{name}.dat"))
                fmt = s.get("fmt", "json")
                options = {
                    k: v for k, v in s.items()
                    if k not in (
                        "target", "path", "fmt", "condition", "expect", "oml",
                    )
                }
            ws.sinks.append(
                SinkSpec(
                    name=name,
                    kind=kind,
                    path=path,
                    format=fmt,
                    condition=condition or s.get("condition"),
                    models=list(models) if models is not None else ["*"],
                    options=options,
                    expect=s.get("expect") or group_expect,
                )
            )

    for p in sorted(glob.glob(os.path.join(sink_dir, "*.toml"))) + sorted(
        glob.glob(os.path.join(sink_dir, "infra.d", "*.toml"))
    ):
        t = _toml(p)
        if "sink_group" in t:
            g = t["sink_group"]
            add_group(
                g.get("name", "data"), g.get("sinks", []), g.get("condition"),
                g.get("oml"), g.get("expect"),
            )
        else:  # framework.toml: one section per infra group
            for name, g in t.items():
                if isinstance(g, dict) and "sinks" in g:
                    add_group(
                        g.get("name", name), g["sinks"], g.get("condition"),
                        g.get("oml"), g.get("expect"),
                    )

    # dedupe by (group, path): framework.toml and infra.d describe the same
    # channels in the two config generations
    seen: set[tuple] = set()
    uniq = []
    for s in ws.sinks:
        k = (s.name,)
        if k in seen:
            continue
        seen.add(k)
        uniq.append(s)
    ws.sinks = uniq
    return ws


def build_pipeline(ws: Workspace, knowdb=None):
    """Workspace -> (Pipeline, enabled batch input paths)."""
    from wp_motor_spark.pipeline import Pipeline

    tags: dict[str, str] = {}
    inputs: list[str] = []
    keys: list[str] = []
    for s in ws.sources:
        if not s.enable:
            continue
        tags.update(s.tags)
        keys.append(s.key)
        if s.kind == "file" and s.path:
            inputs.append(s.path)
    pipe = Pipeline(
        wpl="\n".join(ws.wpl_texts),
        omls=ws.oml_texts,
        sinks=ws.sinks,
        knowdb=knowdb,
        tags=tags,
        # wp_src_key is well-defined when ONE source feeds the pipeline
        src_key=keys[0] if len(keys) == 1 else None,
        robust=ws.robust,
    )
    return pipe, inputs


def read_workspace_lines(spark, ws: Workspace):
    """Read every enabled file source as raw lines, applying the
    source-level ``encode`` option (02-file_source.md: text | base64 |
    hex — the whole LINE is decoded before parsing; WPL's decode/*
    preprocessors are the per-field cousins). ``instances`` is accepted
    and inert: Spark already range-splits file scans into parallel
    partitions. Returns one unioned DataFrame[value]."""
    from pyspark.sql import functions as F

    parts = []
    for s in ws.sources:
        if not s.enable or s.kind != "file" or not s.path:
            continue
        df = spark.read.text(s.path)
        enc = str(s.options.get("encode", "text"))
        if enc == "base64":
            df = df.select(
                F.unbase64(F.regexp_replace("value", r"\s+", ""))
                .cast("string")
                .alias("value")
            )
        elif enc == "hex":
            df = df.select(
                F.unhex(F.regexp_replace("value", r"\s+", ""))
                .cast("string")
                .alias("value")
            )
        elif enc != "text":
            raise ValueError(f"unknown source encode {enc!r}")
        parts.append(df)
    if not parts:
        return spark.createDataFrame([], "value string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
