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
                # memdb.rs test_csv_missing_column_error: selecting more
                # columns than the CSV carries is a LOAD error naming the
                # problem, not a silent index crash
                bad = [i for i in cols["by_index"] if i >= len(all_cols)]
                if bad:
                    raise ValueError(
                        f"knowdb table {t['name']!r}: insufficient columns "
                        f"(csv has {len(all_cols)}, requested index {max(bad)})"
                    )
                df = df.select(*[all_cols[i] for i in cols["by_index"]])
            # load cap (memdb.rs table_load `max`: loads AT MOST max rows,
            # exactly max when the file is longer — test_csv_off_by_one)
            if t.get("max_rows") is not None:
                df = df.limit(int(t["max_rows"]))
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
    """sqlite_ext.rs ip4_between — numeric containment of ip in [lo, hi].

    Bound parity with the reference: the integer branch
    (`ctx.get::<i64>` in sqlite_ext.rs) only fires for INTEGER-typed
    values — rusqlite's i64 FromSql fails on TEXT — and wraps the i64
    as u32 (`i as u32` truncates two's-complement low bits, e.g.
    -1 -> u32::MAX); TEXT bounds go through the strict dotted-quad
    parse only (a numeric string like "123" is NOT a valid bound).
    An unparseable ip or start unwraps to u32::MAX and an unparseable
    end to 0, so invalid input yields FALSE rather than NULL (the
    quirky corollary — invalid ip AND start with
    end=255.255.255.255 -> TRUE — matches too). We branch on the
    column's static type (typeof) to mirror SQLite's value typing."""
    u32max = F.lit(0xFFFFFFFF).cast("long")

    def bound(col: Column, default: Column) -> Column:
        # Rust `i as u32` == mathematical mod 2^32 for any i64: pmod.
        int_branch = F.pmod(col.try_cast("bigint"), F.lit(1 << 32))
        return F.when(
            F.typeof(col) == F.lit("string"),
            F.coalesce(_strict_ip4_int(col), default),
        ).otherwise(F.coalesce(int_branch, default))

    ip_i = F.coalesce(_strict_ip4_int(ip), u32max)
    lo_i = bound(lo, u32max)
    hi_i = bound(hi, F.lit(0).cast("long"))
    return (ip_i >= lo_i) & (ip_i <= hi_i)


# The rest of the reference's built-in KnowDB SQL functions
# (sqlite_ext.rs, documented in 02-config/07-knowdb_config.md) as pure
# JVM Column expressions — usable in enrichment joins and selects with
# no Python worker in the path. Illegal input follows the reference's
# resilience contract: ip4_int-style fns yield 0, cidr parses yield 0.


_OCTET_RE = r"(0|[1-9]\d{0,2})"


def _strict_ip4_int(col: Column) -> Column:
    """Rust `Ipv4Addr::from_str` parity (what parse_ipv4_to_u32 calls):
    exactly four dot-separated octets, no leading zeros, no signs, no
    internal whitespace, each <= 255; surrounding whitespace and quotes
    are shed first (s.trim().trim_matches('\"') strips ALL edge quotes).
    Invalid -> NULL."""
    t = F.regexp_replace(F.trim(col), '^"+|"+$', "")
    valid = t.rlike(
        rf"^{_OCTET_RE}\.{_OCTET_RE}\.{_OCTET_RE}\.{_OCTET_RE}$"
    ) & F.forall(F.split(t, r"\."), lambda x: x.try_cast("int") <= 255)
    return F.when(valid, ip4_to_int(t))


def _ip4_int0(col: Column) -> Column:
    """ip4_int(text): dotted quad -> u32; tolerates edge whitespace and
    quotes; illegal input -> 0 (sqlite_ext.rs parse_ipv4_to_u32 |
    unwrap_or(0))."""
    return F.coalesce(_strict_ip4_int(col), F.lit(0))


def _cidr_parts(cidr: Column) -> tuple[Column, Column]:
    """(network u32, mask u32) for 'a.b.c.d/p'; invalid -> (null, null).
    The prefix follows Rust `u32::from_str`: optional '+', any number of
    digits (leading zeros fine), no whitespace; value must be <= 32."""
    t = F.regexp_replace(F.trim(cidr), '^"+|"+$', "")
    ip_s = F.substring_index(t, "/", 1)
    pfx_s = F.substring_index(t, "/", -1)
    pfx = F.when(
        t.contains("/")
        & (F.size(F.split(t, "/")) == 2)
        & pfx_s.rlike(r"^\+?\d+$"),
        pfx_s.try_cast("bigint"),
    )
    pfx = F.when((pfx >= 0) & (pfx <= 32), pfx.cast("int"))
    ip_i = _strict_ip4_int(ip_s)
    # u32 mask = 2^32 - 2^(32-pfx); pow is exact for exponents <= 32
    # (well under double's 2^53 integer range), so the long cast is safe
    mask = (
        F.lit(4294967296).cast("long")
        - F.pow(F.lit(2.0), (32 - pfx).cast("double")).cast("long")
    )
    valid = pfx.isNotNull() & ip_i.isNotNull()
    return (
        F.when(valid, ip_i.bitwiseAND(mask)),
        F.when(valid, mask),
    )


def cidr4_min(cidr: Column) -> Column:
    """cidr4_min('10.0.0.0/8') -> 167772160; invalid -> 0."""
    net, _mask = _cidr_parts(cidr)
    return F.coalesce(net, F.lit(0).cast("long"))


def cidr4_max(cidr: Column) -> Column:
    """cidr4_max('10.0.0.0/8') -> 184549375; invalid -> 0."""
    net, mask = _cidr_parts(cidr)
    hi = net + (F.lit(0xFFFFFFFF).cast("long") - mask)
    return F.coalesce(hi, F.lit(0).cast("long"))


def cidr4_contains(ip: Column, cidr: Column) -> Column:
    """cidr4_contains(ip, cidr) -> boolean (reference returns 1/0);
    invalid ip or cidr -> false."""
    net, mask = _cidr_parts(cidr)
    ip_i = _strict_ip4_int(ip)
    return F.coalesce(ip_i.bitwiseAND(mask) == net, F.lit(False))


def ip4_text(v: Column) -> Column:
    """ip4_text(int|text) -> dotted quad (sqlite_ext.rs ip4_text +
    ipv4_from_u32). Integer values wrap `i as u32` (low 32 bits of the
    two's complement, = pmod 2^32); TEXT goes through Rust
    `s.trim().parse::<u64>()` — digits only (optional leading '+'),
    must fit u64 — then truncates `as u32`; any parse failure yields 0
    (so "-1", "abc", "1.2.3.4" all print "0.0.0.0" while integer -1
    prints "255.255.255.255"). Branches on the column's static type
    (typeof) to mirror SQLite's value typing, like ip4_between."""
    two32 = 1 << 32
    # Rust str::trim strips ALL whitespace (Spark's trim: spaces only)
    t = F.regexp_replace(v.cast("string"), r"^\s+|\s+$", "")
    dec = t.try_cast("decimal(20,0)")
    u64max = F.expr("CAST('18446744073709551615' AS DECIMAL(20,0))")
    str_u = F.when(
        t.rlike(r"^\+?\d+$") & dec.isNotNull() & (dec <= u64max),
        F.pmod(dec, F.lit(two32).cast("decimal(20,0)")).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    num_u = F.pmod(v.try_cast("bigint"), F.lit(two32))
    u = F.when(F.typeof(v) == F.lit("string"), str_u).otherwise(
        F.coalesce(num_u, F.lit(0).cast("long"))
    )
    return F.concat_ws(
        ".",
        F.shiftright(u, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(u, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(u, 8).bitwiseAND(F.lit(255)).cast("string"),
        u.bitwiseAND(F.lit(255)).cast("string"),
    )


def trim_quotes(col: Column) -> Column:
    """trim_quotes(text): trim whitespace, then strip ONE matching pair of
    quotes (' or \"), tolerating a leading/trailing backslash escape;
    unpaired quotes return the trimmed string (sqlite_ext.rs trim_quotes).

    Degenerate reference edge (byte-walk at trim_quotes: after skipping a
    leading backslash, the head and tail index may be the SAME byte): a
    bare escaped quote — exactly `\\"` or `\\'` — counts as a pair around
    nothing and yields the empty string."""
    t = F.trim(col)
    return F.when(t.rlike(r"""^\\["']$"""), F.lit("")).otherwise(
        F.regexp_replace(t, r"""^\\?(["'])(.*?)\\?\1$""", "$2")
    )
