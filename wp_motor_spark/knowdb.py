"""KnowDB: enrichment dimension store as broadcast DataFrames.

Reference (SURVEY.md §2.8): CSV dirs loaded into in-memory SQLite with
thread-cloned replicas (crates/wp-knowledge/{loader.rs,facade.rs}), queried
per-record by OML `select ... where k = :param` with an LRU cache, plus
custom SQL fns ip4_int / ip4_between (sqlite_ext.rs:13-49).

Spark design: each table is a DataFrame broadcast to every executor — the
per-executor replica AND the query cache collapse into a broadcast hash
join. IP-range lookups become broadcast range joins; at scale add a /8
prefix bucket to both sides to keep the join selective instead of a full
cross-product BNLJ.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from wp_motor_spark.oml.functions import ip4_to_int


class KnowDB:
    """Registry of dimension tables (loaded from CSV dirs or given directly)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, DataFrame] = {}

    def load_csv_dir(self, root: str) -> "KnowDB":
        """Load `{root}/{table}/data.csv` dirs (loader.rs:146-300 layout);
        also accepts flat `{root}/{table}.csv` files."""
        for entry in sorted(os.listdir(root)):
            path = os.path.join(root, entry)
            if os.path.isdir(path) and os.path.exists(os.path.join(path, "data.csv")):
                self.register(entry, self._read_csv(os.path.join(path, "data.csv")))
            elif entry.endswith(".csv"):
                self.register(entry[:-4], self._read_csv(path))
        return self

    def _read_csv(self, path: str) -> DataFrame:
        return self.spark.read.csv(path, header=True, inferSchema=True)

    def load_knowdb_toml(self, work_root: str) -> "KnowDB":
        """Load the v2 `models/knowledge/knowdb.toml` project config
        (wp-knowledge loader.rs KnowDbConf; wp-cli-core knowdb::check):
        per-table dirs with data files, column selection by_header /
        by_index, the `[csv]` delimiter/header conf, and `expected_rows`
        min/max validated at load (on violation: raise, matching
        on_error = "fail")."""
        import tomllib

        conf_path = os.path.join(work_root, "models", "knowledge", "knowdb.toml")
        with open(conf_path, "rb") as fh:
            conf = tomllib.load(fh)
        if int(conf.get("version", 0)) != 2:
            raise ValueError("knowdb.version must be 2")
        base = os.path.join(os.path.dirname(conf_path), conf.get("base_dir", "."))
        csv_conf = conf.get("csv", {})
        header = bool(csv_conf.get("has_header", True))
        delim = csv_conf.get("delimiter", ",")
        for t in conf.get("tables", []):
            if not t.get("enabled", True):
                continue
            dir_name = t.get("dir", t["name"])
            data = os.path.join(base, dir_name, t.get("data_file", "data.csv"))
            df = self.spark.read.csv(
                data, header=header, sep=delim, inferSchema=True
            )
            cols = t.get("columns", {})
            if cols.get("by_header"):
                df = df.select(*cols["by_header"])
            elif cols.get("by_index"):
                all_cols = df.columns
                df = df.select(*[all_cols[i] for i in cols["by_index"]])
            exp = t.get("expected_rows")
            if exp:
                n = df.count()
                lo, hi = exp.get("min"), exp.get("max")
                if (lo is not None and n < lo) or (hi is not None and n > hi):
                    raise ValueError(
                        f"knowdb table {t['name']!r}: {n} rows outside "
                        f"expected [{lo}, {hi}]"
                    )
            self.register(t["name"], df)
        return self

    def register(self, name: str, df: DataFrame) -> "KnowDB":
        self.tables[name] = df
        return self

    def table(self, name: str) -> DataFrame:
        if name not in self.tables:
            raise KeyError(f"KnowDB table {name!r} not loaded (facade.rs whitelist)")
        return self.tables[name]

    # -- lookups ------------------------------------------------------------

    def enrich(
        self,
        df: DataFrame,
        table: str,
        on: dict[str, str],
        select: list[str] | None = None,
        prefix: str = "",
    ) -> DataFrame:
        """Equi-key enrichment: OML `x = select cols from t where k = read(f)`.

        ``on`` maps dim-column -> fact-column. Implemented as a broadcast
        hash join (the LRU point-query cache of sql.rs:53-64 is subsumed —
        the join amortizes every repeated key for free).
        """
        dim = self.table(table)
        if select:
            dim = dim.select(*dict.fromkeys(list(on) + select))
        if prefix:
            for c in dim.columns:
                if c not in on:
                    dim = dim.withColumnRenamed(c, prefix + c)
        cond = None
        for dk, fk in on.items():
            piece = dim[dk] == df[fk]
            cond = piece if cond is None else (cond & piece)
        out = df.join(broadcast(dim), cond, "left")
        return out.drop(*[dim[dk] for dk in on])

    def enrich_ip_range(
        self,
        df: DataFrame,
        table: str,
        ip_col: str,
        lo: str = "lo",
        hi: str = "hi",
        select: list[str] | None = None,
    ) -> DataFrame:
        """Range-band lookup: `where ip4_between(:ip, lo, hi)`
        (sql_prm.rs:196-201 rewrite; sqlite_ext.rs ip4_between).

        Broadcast range join on the integer form. Dim lo/hi may be dotted
        quads or ints. At 100TB fact scale this stays a broadcast nested
        loop ONLY over the small dim (fine); for large dims, bucket both
        sides by /8 prefix first.
        """
        dim = self.table(table)
        lo_i = ip4_to_int(F.col(lo).cast("string")) if dict(dim.dtypes)[lo] == "string" else F.col(lo)
        hi_i = ip4_to_int(F.col(hi).cast("string")) if dict(dim.dtypes)[hi] == "string" else F.col(hi)
        dim = dim.withColumn("__lo_i", lo_i).withColumn("__hi_i", hi_i)
        if select:
            dim = dim.select("__lo_i", "__hi_i", *select)
        fact = df.withColumn("__ip_i", ip4_to_int(F.col(ip_col)))
        out = fact.join(
            broadcast(dim),
            (fact["__ip_i"] >= dim["__lo_i"]) & (fact["__ip_i"] <= dim["__hi_i"]),
            "left",
        )
        return out.drop("__ip_i", "__lo_i", "__hi_i")


def ip4_between(ip: Column, lo: Column, hi: Column) -> Column:
    """sqlite_ext.rs:13-49 — numeric containment of ip in [lo, hi]."""
    ip_i = ip4_to_int(ip)
    lo_i = ip4_to_int(lo)
    hi_i = ip4_to_int(hi)
    return (ip_i >= lo_i) & (ip_i <= hi_i)
