"""WPL AST.

Models the grammar in the reference's
docs/usage/en/03-wpl/06-grammar-reference.md (EBNF). One dataclass per
production we support; pipes are kept as parsed calls and become rule-match
guards at compile time (SURVEY.md §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class FunCall:
    """A field-level pipe function, e.g. chars_has(x), digit_range(1,10)."""

    name: str
    args: list[str] = field(default_factory=list)
    # wrapper not(...) nests:
    inner: "FunCall | None" = None


@dataclass
class WplSubfield:
    """Subfield of a composite field (json/kvarr): (type@ref:name)."""

    dtype: str = "auto"
    ref: str = "*"
    name: str | None = None
    optional: bool = False
    # quoted refs (@'event.type' / @"a\"b") are LITERAL key names: no
    # path segmentation on '/' or '.' (field_reference.md single-quote
    # section); unquoted refs keep path semantics (@a/b = nested)
    quoted: bool = False
    # grammar: subfield = [type] [symbol-args] [@ref] [:name] [format]
    # [sep] {pipe} (wpl_field.rs wpl_id_field ordering) — transform pipes
    # apply to the extracted value; quote fmt accepted-and-inert (JSON
    # strings are already unquoted on extraction); a scope fmt wraps the
    # typed kv-value pattern in its begin/end anchors
    fmt: str | None = None
    scope: tuple | None = None  # <beg,end> scope anchors on the type
    symbol: str | None = None  # content for symbol/peek_symbol subfields
    pipes: list = field(default_factory=list)
    # `json(chars@k | (time,ip))` — the subfield VALUE is re-parsed by a
    # nested group (wpl_group.rs test_parse_group_pipe3/3_1/4_1,
    # assemble_pipe PipeEnum::Group)
    subgroup: "WplGroup | None" = None


@dataclass
class WplField:
    dtype: str  # normalized type key, e.g. 'ip', 'time/clf', 'http/request', '_'
    repeat: int | None = 1  # None => unbounded '*type'
    name: str | None = None
    symbol: str | None = None  # content for symbol/peek_symbol
    subfields: list[WplSubfield] = field(default_factory=list)
    length: int | None = None
    fmt: tuple[str, str] | None = None  # (begin, end); quote fmt => ('"', '"')
    sep: str | None = None  # explicit separator AFTER this field
    pattern_sep: str | None = None  # raw pattern-separator content (inside {})
    pipes: list[FunCall] = field(default_factory=list)
    # decode-then-subparse: `base64 | (chars:x)` (protocol/base64.rs)
    subgroup: "WplGroup | None" = None


@dataclass
class WplGroup:
    meta: str = "seq"  # seq | alt | opt | some_of | not
    items: list["WplField | WplGroup"] = field(default_factory=list)
    sep: str | None = None
    pattern_sep: str | None = None


@dataclass
class WplRule:
    name: str
    preprocs: list[str] = field(default_factory=list)  # e.g. ['decode/base64']
    groups: list[WplGroup] = field(default_factory=list)  # comma-joined
    tags: dict[str, str] = field(default_factory=dict)  # #[tag(k:"v")]
    copy_raw: str | None = None  # #[copy_raw(name:"x")]
    package: str | None = None

    @property
    def key(self) -> str:
        """wpl_key: package/rule path used for OML selection + sink grouping
        (reference: src/core/parser/wpl_engine/parser.rs:48-54)."""
        return f"{self.package}/{self.name}" if self.package else self.name
