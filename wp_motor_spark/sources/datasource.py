"""PySpark DataSource (Spark 4 Python data source API): `wp_socket`.

Direct `spark.readStream.format("wp_socket")` over a TCP (RFC6587-framed)
or UDP listener — the reference's tcp/syslog sources (SURVEY.md §2.1) as a
first-class Spark source. Like Spark's built-in socket source this is a
dev/ingest-edge tool: offsets advance with arrival and are not replayable
after restart (production path: collector -> spool/Kafka -> checkpointed
stream; see sources/net.py).

Usage:
    spark.dataSource.register(WpSocketDataSource)
    df = (spark.readStream.format("wp_socket")
          .option("port", 5140).option("mode", "tcp").load())
"""

from __future__ import annotations

import threading

try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    _HAS_DATASOURCE = True
except ImportError:  # pragma: no cover - pre-4.0 Spark
    _HAS_DATASOURCE = False

    class DataSource:  # type: ignore
        pass

    class DataSourceStreamReader:  # type: ignore
        pass

    class InputPartition:  # type: ignore
        def __init__(self, value):
            self.value = value


class _MsgBuffer:
    """Grow-only message log shared between the listener thread and
    latestOffset/partitions; trimmed at commit()."""

    def __init__(self):
        self.lock = threading.Lock()
        self.msgs: list[str] = []
        self.base = 0  # absolute offset of msgs[0]

    def append(self, m: str) -> None:
        with self.lock:
            self.msgs.append(m)

    def end_offset(self) -> int:
        with self.lock:
            return self.base + len(self.msgs)

    def slice(self, start: int, end: int) -> list[str]:
        with self.lock:
            return self.msgs[start - self.base : end - self.base]

    def trim(self, upto: int) -> None:
        with self.lock:
            drop = max(0, upto - self.base)
            self.msgs = self.msgs[drop:]
            self.base += drop


# Spark instantiates the reader more than once (planning + execution);
# one listener per (host, port, mode) per process, sharing its buffer.
_LISTENERS: dict[tuple, "_MsgBuffer"] = {}
_LISTENERS_LOCK = threading.Lock()


class WpSocketStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", 0))
        self.mode = options.get("mode", "tcp").lower()
        # tcp framing mode (tcp/config.rs: auto|line|len, "length" alias)
        self.framing = options.get("framing", "auto").lower()
        self.buf = _MsgBuffer()
        self._started = False

    def _ensure_listener(self) -> None:
        """Bind lazily on the first offset call: Spark instantiates the
        reader at plan time in the main driver process AND at run time in
        the streaming-source runner process — only the latter asks for
        offsets, so only it binds the port."""
        if self._started:
            return
        key = (self.host, self.port, self.mode)
        with _LISTENERS_LOCK:
            existing = _LISTENERS.get(key) if self.port else None
            if existing is not None:
                self.buf = existing
            else:
                self._start_listener()
                if self.port:
                    _LISTENERS[key] = self.buf
        self._started = True

    def _start_listener(self) -> None:
        import socket as pysocket

        from wp_motor_spark.sources.syslog import frame_buffer

        buf = self.buf

        if self.mode == "udp":
            sock = pysocket.socket(pysocket.AF_INET, pysocket.SOCK_DGRAM)
            sock.bind((self.host, self.port))
            self.bound_port = sock.getsockname()[1]

            def run_udp():
                sock.settimeout(0.2)
                while True:
                    try:
                        data, _ = sock.recvfrom(65535)
                    except pysocket.timeout:
                        continue
                    except OSError:
                        return
                    if data:
                        buf.append(data.rstrip(b"\n").decode("utf-8", "replace"))

            threading.Thread(target=run_udp, daemon=True).start()
            return

        srv = pysocket.socket(pysocket.AF_INET, pysocket.SOCK_STREAM)
        srv.setsockopt(pysocket.SOL_SOCKET, pysocket.SO_REUSEADDR, 1)
        srv.bind((self.host, self.port))
        srv.listen(64)
        self.bound_port = srv.getsockname()[1]

        def serve(conn):
            pending = b""
            with conn:
                while True:
                    try:
                        data = conn.recv(65536)
                    except OSError:
                        break
                    if not data:
                        break
                    pending += data
                    msgs, pending = frame_buffer(pending, self.framing)
                    for m in msgs:
                        buf.append(m.decode("utf-8", "replace"))
            if pending:
                buf.append(pending.decode("utf-8", "replace"))

        def accept_loop():
            srv.settimeout(0.2)
            while True:
                try:
                    conn, _ = srv.accept()
                except pysocket.timeout:
                    continue
                except OSError:
                    return
                threading.Thread(target=serve, args=(conn,), daemon=True).start()

        threading.Thread(target=accept_loop, daemon=True).start()

    # executors unpickle the reader only to call read(partition); drop the
    # driver-side listener state (locks/sockets aren't picklable)
    def __getstate__(self):
        return {"host": self.host, "port": self.port, "mode": self.mode, "framing": self.framing}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.buf = _MsgBuffer()
        self._started = True  # never bind on an executor

    # ---- DataSourceStreamReader contract ----

    def initialOffset(self) -> dict:
        self._ensure_listener()
        return {"offset": 0}

    def latestOffset(self) -> dict:
        self._ensure_listener()
        return {"offset": self.buf.end_offset()}

    def partitions(self, start: dict, end: dict):
        msgs = self.buf.slice(start["offset"], end["offset"])
        return [InputPartition(msgs)]

    def read(self, partition):
        for m in partition.value:
            yield (m,)

    def commit(self, end: dict) -> None:
        self.buf.trim(end["offset"])


class WpSocketDataSource(DataSource):
    """format("wp_socket") — options: host, port, mode=tcp|udp."""

    @classmethod
    def name(cls) -> str:
        return "wp_socket"

    def schema(self) -> str:
        return "value string"

    def streamReader(self, schema):
        return WpSocketStreamReader(self.options)


def register(spark) -> None:
    if not _HAS_DATASOURCE:
        raise NotImplementedError("PySpark DataSource API requires Spark >= 4.0")
    spark.dataSource.register(WpSocketDataSource)
