"""Semantic dictionary (reference: wp-oml semantic_dict_loader.rs +
extract_word.rs): the built-in stop/domain/status/action/entity word
sets, an external `semantic_dict.toml` (version 1) merged in `add` or
`replace` mode, and the `SEMANTIC_DICT_CONFIG` env hook the reference's
global Lazy dict honors.

The dict feeds the OML semantic pipes (`extract_main_word`,
`extract_subject_object` in oml/functions.py): stop words are dropped
from candidate tokens, status words drive the status slot, action verbs
the action slot. `core_pos` is hard-coded and non-configurable in the
reference; it only matters to the jieba-POS path, which is env-gated.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass, field

SUPPORTED_VERSION = 1

_BUILTIN_STOP = {
    # Chinese
    "的", "了", "在", "是", "我", "有", "和", "就", "不", "人", "都", "一",
    "一个", "上", "也", "很", "到", "说", "要", "去", "你", "会", "着",
    "没有", "看", "好", "自己", "这",
    # English
    "the", "a", "an", "is", "are", "was", "were", "be", "been", "being",
    "of", "at", "in", "to", "for", "and", "or", "but",
}

_BUILTIN_DOMAIN = {
    "error", "warn", "info", "debug", "fatal", "trace",
    "exception", "failure", "timeout", "connection", "database", "server",
    "client", "request", "response", "login", "logout", "auth",
    "authentication", "permission", "access",
    "http", "https", "tcp", "udp", "ip", "port", "socket",
    "attack", "virus", "malware", "threat", "alert", "blocked", "denied",
}

_BUILTIN_STATUS = {
    "failed", "failure", "success", "succeeded", "timeout", "exception",
    "crashed", "disconnected", "stopped", "completed", "pending", "refused",
    "dropped", "rejected", "expired", "closed",
    "失败", "成功", "超时", "异常", "错误", "崩溃", "断开", "拒绝", "丢失",
}

_BUILTIN_ACTION = {
    "connect", "login", "logout", "respond", "start", "stop", "fail", "run",
    "process", "send", "receive", "read", "write", "open", "close", "bind",
    "listen", "authenticate", "authorize", "create", "delete", "update",
    "upload", "download", "retry", "handle", "load", "fetch", "parse",
    "resolve", "block", "deny",
    "连接", "登录", "登出", "请求", "响应", "启动", "停止", "处理", "发送",
    "接收", "读取", "写入", "认证", "访问", "创建", "删除", "更新", "下载",
    "上传", "重试",
}

_BUILTIN_ENTITY = {
    "connection", "transaction", "session", "application", "configuration",
    "permission", "operation", "exception",
    "连接", "会话", "事务", "应用", "配置", "权限",
}

_CORE_POS = {
    "n", "nr", "ns", "nt", "nz", "ng",
    "v", "vn", "vd",
    "a", "ad", "an",
    "eng", "m", "x", "t", "i",
}


@dataclass
class SemanticDict:
    stop_words: set[str] = field(default_factory=lambda: set(_BUILTIN_STOP))
    domain_words: set[str] = field(default_factory=lambda: set(_BUILTIN_DOMAIN))
    status_words: set[str] = field(default_factory=lambda: set(_BUILTIN_STATUS))
    action_verbs: set[str] = field(default_factory=lambda: set(_BUILTIN_ACTION))
    entity_nouns: set[str] = field(default_factory=lambda: set(_BUILTIN_ENTITY))
    core_pos: frozenset[str] = frozenset(_CORE_POS)  # hard-coded, like the ref

    @classmethod
    def builtin(cls) -> "SemanticDict":
        return cls()

    def merge(self, conf: dict) -> "SemanticDict":
        """Merge a parsed semantic_dict.toml: `add` extends each declared
        set, `replace` swaps it wholesale (undeclared sections keep the
        built-ins in both modes — loader.rs merge())."""
        replace = conf.get("mode", "add") == "replace"

        def lang_words(section: dict) -> set[str]:
            return {
                w
                for key in ("chinese", "english")
                for w in section.get(key, [])
            }

        for attr, key in (
            ("stop_words", "stop_words"),
            ("status_words", "status_words"),
            ("action_verbs", "action_verbs"),
            ("entity_nouns", "entity_nouns"),
        ):
            if key in conf:
                new = lang_words(conf[key])
                setattr(
                    self, attr, new if replace else getattr(self, attr) | new
                )
        if "domain_words" in conf:
            # domain_words is category -> word list (flattened)
            new = {
                w for words in conf["domain_words"].values() for w in words
            }
            self.domain_words = new if replace else self.domain_words | new
        return self


def load_semantic_dict(path: str) -> dict:
    """Parse + version-check an external semantic_dict.toml."""
    with open(path, "rb") as fh:
        conf = tomllib.load(fh)
    if int(conf.get("version", 0)) != SUPPORTED_VERSION:
        raise ValueError(
            f"Unsupported semantic_dict version: {conf.get('version')}. "
            f"Expected: {SUPPORTED_VERSION}"
        )
    return conf


_GLOBAL: SemanticDict | None = None


def semantic_dict() -> SemanticDict:
    """The process-global dict (SEMANTIC_DICT lazy static): built-ins,
    plus `SEMANTIC_DICT_CONFIG` merged when the env var points at a
    readable config; load failures warn and fall back, like the Rust."""
    global _GLOBAL
    if _GLOBAL is None:
        d = SemanticDict.builtin()
        cfg = os.environ.get("SEMANTIC_DICT_CONFIG")
        if cfg:
            try:
                d.merge(load_semantic_dict(cfg))
            except Exception as e:  # warn-and-continue, never fail startup
                import sys

                print(
                    f"Warning: Failed to load external semantic dict config: {e}.",
                    file=sys.stderr,
                )
        _GLOBAL = d
    return _GLOBAL


def reset_semantic_dict() -> None:
    """Test hook: drop the cached global so SEMANTIC_DICT_CONFIG re-reads."""
    global _GLOBAL
    _GLOBAL = None


# Global semantic switch (semantic_dict_loader.rs SEMANTIC_ENABLED
# AtomicBool, default FALSE): wparse.toml [semantic] enabled flips it at
# startup (service.rs:50 set_semantic_enabled(conf.semantic().enabled)).
# When disabled, extract_main_word returns an empty string and
# extract_subject_object an empty object (extract_word.rs:311,370).
_SEMANTIC_ENABLED = False


def set_semantic_enabled(v: bool) -> None:
    global _SEMANTIC_ENABLED
    _SEMANTIC_ENABLED = bool(v)


def is_semantic_enabled() -> bool:
    return _SEMANTIC_ENABLED
