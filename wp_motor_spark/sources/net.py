"""Network collectors: UDP datagram + TCP (RFC6587-framed) listeners that
spool messages to a directory consumed by a Spark file stream.

Reference: src/sources/tcp/ (acceptor + framing + connection pool) and
src/sources/syslog/udp_source.rs (SO_REUSEPORT datagram receiver).

Design note (SURVEY.md §2.1): Spark executors can't own listening sockets —
the idiomatic bridge is collector -> spool -> `readStream.format("text")`,
which converts the socket's at-most-once bytes into checkpointed,
exactly-once file-stream delivery (same role as the reference's rescue
files, but stronger). In production the same role is played by Kafka; this
collector is the built-in, dependency-free equivalent. A PySpark
DataSource implementation is provided in sources/datasource.py for
direct `spark.readStream.format("wp_socket")` use.
"""

from __future__ import annotations

import os
import socket
import threading
import time
import uuid

from wp_motor_spark.sources.syslog import frame_buffer

MAX_DGRAM = 65535


class SpoolWriter:
    """Append messages to rolling spool files (atomic rename per roll)."""

    def __init__(self, spool_dir: str, roll_every: float = 1.0):
        self.dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self.roll_every = roll_every
        self._buf: list[bytes] = []
        self._last_roll = time.monotonic()
        self._lock = threading.Lock()

    def add(self, msg: bytes) -> None:
        with self._lock:
            self._buf.append(msg)
            if time.monotonic() - self._last_roll >= self.roll_every:
                self._flush_locked()

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if self._buf:
            tmp = os.path.join(self.dir, f".{uuid.uuid4().hex}.tmp")
            dst = os.path.join(self.dir, f"{time.time_ns()}.log")
            with open(tmp, "wb") as f:
                f.write(b"\n".join(self._buf) + b"\n")
            os.rename(tmp, dst)  # atomic: the file stream never sees partials
            self._buf = []
        self._last_roll = time.monotonic()


class UdpCollector:
    """UDP datagram receiver -> spool (udp_source.rs). One datagram = one
    message (syslog UDP semantics)."""

    def __init__(
        self, host: str, port: int, spool_dir: str, reuse_port: bool = False
    ):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # SO_REUSEPORT is OPT-IN only: the reference's design review
        # (docs/dar/udp_reuseport.md) REJECTED enabling it by default —
        # same-UID processes can bind the port and intercept traffic, and
        # BSD/macOS deliver to one socket anyway (no kernel balancing).
        if reuse_port and hasattr(socket, "SO_REUSEPORT"):
            self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
        self.sock.bind((host, port))
        self.port = self.sock.getsockname()[1]
        self.writer = SpoolWriter(spool_dir)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self) -> "UdpCollector":
        self._thread.start()
        return self

    def _run(self) -> None:
        self.sock.settimeout(0.2)
        while not self._stop.is_set():
            try:
                data, _addr = self.sock.recvfrom(MAX_DGRAM)
            except socket.timeout:
                continue
            except OSError:
                break
            if data:
                self.writer.add(data.rstrip(b"\n"))
        self.writer.flush()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
        self.writer.flush()
        self.sock.close()


class TcpCollector:
    """TCP listener with RFC6587 auto-framing per connection -> spool
    (tcp_source.rs; per-connection buffers like process_buffer)."""

    def __init__(
        self, host: str, port: int, spool_dir: str, max_conns: int = 1000,
        framing: str = "auto",
    ):
        # framing mode knob (tcp/config.rs: auto|line|len, "length" alias)
        self.framing = framing
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind((host, port))
        self.sock.listen(max_conns)
        self.port = self.sock.getsockname()[1]
        self.writer = SpoolWriter(spool_dir)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)

    def start(self) -> "TcpCollector":
        self._thread.start()
        return self

    def _accept_loop(self) -> None:
        self.sock.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _addr = self.sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket) -> None:
        buf = b""
        conn.settimeout(0.5)
        with conn:
            while not self._stop.is_set():
                try:
                    data = conn.recv(65536)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if not data:
                    break
                buf += data
                msgs, buf = frame_buffer(buf, self.framing)
                for m in msgs:
                    self.writer.add(m)
        if buf:  # trailing unterminated frame on close
            self.writer.add(buf)
        self.writer.flush()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
        time.sleep(0.3)  # let per-connection threads drain
        self.writer.flush()
        self.sock.close()
