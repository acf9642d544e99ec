"""Embedded single-process Kafka stub broker — the integration-test
substrate for ``kafka_wire`` (the way tests/test_connectors.py runs a
live MongoDB wire server for the BSON client). Speaks the same public
protocol subset the client implements: ApiVersions v0, Metadata v1,
ListOffsets v1, Produce v3, Fetch v4, record batches v2 (CRC-verified
on append). In-memory single-broker topology; topics auto-create on
first produce (1 partition) or can be pre-created with N partitions.

NOT a broker for production — it exists so a CREATE STREAM .. WITH
(KAFKA_TOPIC=..) round-trip can be proven live in CI with zero
external dependencies.
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Optional

from hstream_spark.sources import kafka_wire as W


class _PartitionLog:
    """Append-only in-memory log of re-based record batches."""

    __slots__ = ("batches", "next_offset")

    def __init__(self):
        self.batches: list[tuple[int, int, bytes]] = []  # (base, last, raw)
        self.next_offset = 0

    def append(self, record_set: bytes) -> int:
        records = W.decode_record_batches(record_set)  # validates CRC (+codec)
        if not records:
            raise W.KafkaWireError("empty record set")
        first_base = self.next_offset
        # Rebase IN PLACE like a real broker: baseOffset sits OUTSIDE
        # the CRC range precisely so brokers can rewrite it on append
        # without re-signing — this preserves the producer's original
        # bytes (compression included), so Fetch serves back exactly
        # what was produced and consumers exercise their decode path.
        buf = bytearray(record_set)
        pos = 0
        base = first_base
        while pos + 12 <= len(buf):
            batch_len = struct.unpack(">i", buf[pos + 8:pos + 12])[0]
            # header layout: prefix(12) leaderEpoch(4) magic(1) crc(4)
            # attributes(2) lastOffsetDelta(4)
            lod = struct.unpack(">i", buf[pos + 23:pos + 27])[0]
            buf[pos:pos + 8] = struct.pack(">q", base)
            raw = bytes(buf[pos:pos + 12 + batch_len])
            last = base + lod
            self.batches.append((base, last, raw))
            base = last + 1
            pos += 12 + batch_len
        self.next_offset = base
        return first_base

    def read_from(self, offset: int, max_bytes: int) -> bytes:
        out = bytearray()
        for base, last, raw in self.batches:
            if last < offset:
                continue
            if out and len(out) + len(raw) > max_bytes:
                break
            out += raw
        return bytes(out)


class KafkaStubBroker:
    """``with KafkaStubBroker() as b: client = KafkaClient(b.bootstrap)``"""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(16)
        self.host, self.port = self._sock.getsockname()
        self.bootstrap = f"{self.host}:{self.port}"
        self._topics: dict[str, dict[int, _PartitionLog]] = {}
        # broker-stored consumer offsets: (group, topic, partition) → next
        self._group_offsets: dict[tuple[str, str, int], int] = {}
        self._lock = threading.Lock()
        self._stopping = threading.Event()
        self._threads: list[threading.Thread] = []
        t = threading.Thread(target=self._accept_loop, daemon=True,
                             name="kafka-stub-accept")
        t.start()
        self._threads.append(t)

    # -- admin -------------------------------------------------------------

    def create_topic(self, name: str, partitions: int = 1) -> None:
        with self._lock:
            self._topics.setdefault(
                name, {p: _PartitionLog() for p in range(partitions)}
            )

    def close(self) -> None:
        self._stopping.set()
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "KafkaStubBroker":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- serving -----------------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stopping.is_set():
            try:
                conn, _addr = self._sock.accept()
            except OSError:
                return
            t = threading.Thread(target=self._serve, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def _serve(self, conn: socket.socket) -> None:
        try:
            while not self._stopping.is_set():
                head = self._recv_exact(conn, 4)
                if head is None:
                    return
                size = struct.unpack(">i", head)[0]
                frame = self._recv_exact(conn, size)
                if frame is None:
                    return
                r = W._Reader(frame)
                api_key, api_version = r.int16(), r.int16()
                corr = r.int32()
                r.string()  # client_id
                body = self._dispatch(api_key, api_version, r)
                resp = W.enc_int32(corr) + body
                conn.sendall(W.enc_int32(len(resp)) + resp)
        except (OSError, W.KafkaWireError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    @staticmethod
    def _recv_exact(conn: socket.socket, n: int) -> Optional[bytes]:
        chunks = []
        while n:
            try:
                chunk = conn.recv(n)
            except OSError:
                return None
            if not chunk:
                return None
            chunks.append(chunk)
            n -= len(chunk)
        return b"".join(chunks)

    def _dispatch(self, api_key: int, api_version: int, r: "W._Reader") -> bytes:
        if api_key == W.API_VERSIONS:
            supported = [
                (W.API_PRODUCE, 0, 3), (W.API_FETCH, 0, 4),
                (W.API_LIST_OFFSETS, 0, 1), (W.API_METADATA, 0, 1),
                (W.API_OFFSET_COMMIT, 0, 2), (W.API_OFFSET_FETCH, 0, 1),
                (W.API_FIND_COORDINATOR, 0, 0),
                (W.API_VERSIONS, 0, 0),
            ]
            return W.enc_int16(0) + W.enc_array([
                W.enc_int16(k) + W.enc_int16(lo) + W.enc_int16(hi)
                for k, lo, hi in supported
            ])
        if api_key == W.API_METADATA:
            n = r.int32()
            names = (
                sorted(self._topics)
                if n < 0
                else [r.string() for _ in range(n)]
            )
            brokers = W.enc_array([
                W.enc_int32(0) + W.enc_string(self.host)
                + W.enc_int32(self.port) + W.enc_nullable_string(None)
            ])
            topics = []
            with self._lock:
                for name in names:
                    parts = self._topics.get(name)
                    if parts is None:
                        # auto-create on metadata, like broker default
                        parts = {0: _PartitionLog()}
                        self._topics[name] = parts
                    topics.append(
                        W.enc_int16(0) + W.enc_string(name) + W.enc_int8(0)
                        + W.enc_array([
                            W.enc_int16(0) + W.enc_int32(p) + W.enc_int32(0)
                            + W.enc_array([W.enc_int32(0)])
                            + W.enc_array([W.enc_int32(0)])
                            for p in sorted(parts)
                        ])
                    )
            return brokers + W.enc_int32(0) + W.enc_array(topics)
        if api_key == W.API_LIST_OFFSETS:
            r.int32()  # replica_id
            out_topics = []
            for _ in range(r.int32()):
                name = r.string()
                parts_out = []
                for _p in range(r.int32()):
                    pid, ts = r.int32(), r.int64()
                    with self._lock:
                        log = self._topics.get(name, {}).get(pid)
                    if log is None:
                        parts_out.append(
                            W.enc_int32(pid) + W.enc_int16(3)  # unknown
                            + W.enc_int64(-1) + W.enc_int64(-1)
                        )
                        continue
                    off = 0 if ts == W.EARLIEST else log.next_offset
                    parts_out.append(
                        W.enc_int32(pid) + W.enc_int16(0)
                        + W.enc_int64(-1) + W.enc_int64(off)
                    )
                out_topics.append(W.enc_string(name) + W.enc_array(parts_out))
            return W.enc_array(out_topics)
        if api_key == W.API_PRODUCE:
            r.string()  # transactional_id (nullable)
            r.int16()  # acks
            r.int32()  # timeout
            out_topics = []
            for _ in range(r.int32()):
                name = r.string()
                parts_out = []
                for _p in range(r.int32()):
                    pid = r.int32()
                    record_set = r.bytes_() or b""
                    # append under the broker lock: concurrent Produce
                    # connections (kafka_sink sends per Spark partition)
                    # must serialize offset assignment
                    with self._lock:
                        log = self._topics.setdefault(
                            name, {0: _PartitionLog()}
                        ).get(pid)
                        if log is None:
                            parts_out.append(
                                W.enc_int32(pid) + W.enc_int16(3)
                                + W.enc_int64(-1) + W.enc_int64(-1)
                            )
                            continue
                        try:
                            base = log.append(record_set)
                            parts_out.append(
                                W.enc_int32(pid) + W.enc_int16(0)
                                + W.enc_int64(base) + W.enc_int64(-1)
                            )
                        except W.KafkaWireError:
                            parts_out.append(
                                W.enc_int32(pid) + W.enc_int16(2)  # corrupt
                                + W.enc_int64(-1) + W.enc_int64(-1)
                            )
                out_topics.append(W.enc_string(name) + W.enc_array(parts_out))
            return W.enc_array(out_topics) + W.enc_int32(0)
        if api_key == W.API_FETCH:
            r.int32()  # replica
            r.int32()  # max_wait
            r.int32()  # min_bytes
            r.int32()  # max_bytes
            r.int8()  # isolation
            out_topics = []
            for _ in range(r.int32()):
                name = r.string()
                parts_out = []
                for _p in range(r.int32()):
                    pid, offset, pmax = r.int32(), r.int64(), r.int32()
                    with self._lock:
                        log = self._topics.get(name, {}).get(pid)
                    if log is None:
                        parts_out.append(
                            W.enc_int32(pid) + W.enc_int16(3)
                            + W.enc_int64(-1) + W.enc_int64(-1)
                            + W.enc_int32(-1) + W.enc_bytes(None)
                        )
                        continue
                    data = log.read_from(offset, pmax)
                    parts_out.append(
                        W.enc_int32(pid) + W.enc_int16(0)
                        + W.enc_int64(log.next_offset)  # high watermark
                        + W.enc_int64(log.next_offset)  # last stable
                        + W.enc_int32(0)  # no aborted txns
                        + W.enc_bytes(data)
                    )
                out_topics.append(W.enc_string(name) + W.enc_array(parts_out))
            return W.enc_int32(0) + W.enc_array(out_topics)
        if api_key == W.API_FIND_COORDINATOR:
            r.string()  # group_id — single-broker: we ARE the coordinator
            return (
                W.enc_int16(0) + W.enc_int32(0)
                + W.enc_string(self.host) + W.enc_int32(self.port)
            )
        if api_key == W.API_OFFSET_COMMIT:
            group = r.string() or ""
            r.int32()  # generation_id
            r.string()  # member_id
            if api_version >= 2:
                r.int64()  # retention_time
            out_topics = []
            for _ in range(r.int32()):
                name = r.string()
                parts_out = []
                for _p in range(r.int32()):
                    pid = r.int32()
                    off = r.int64()
                    r.string()  # metadata
                    with self._lock:
                        self._group_offsets[(group, name, pid)] = off
                    parts_out.append(W.enc_int32(pid) + W.enc_int16(0))
                out_topics.append(W.enc_string(name) + W.enc_array(parts_out))
            return W.enc_array(out_topics)
        if api_key == W.API_OFFSET_FETCH:
            group = r.string() or ""
            out_topics = []
            for _ in range(r.int32()):
                name = r.string()
                parts_out = []
                for _p in range(r.int32()):
                    pid = r.int32()
                    with self._lock:
                        off = self._group_offsets.get((group, name, pid), -1)
                    parts_out.append(
                        W.enc_int32(pid) + W.enc_int64(off)
                        + W.enc_nullable_string(None) + W.enc_int16(0)
                    )
                out_topics.append(W.enc_string(name) + W.enc_array(parts_out))
            return W.enc_array(out_topics)
        raise W.KafkaWireError(f"stub broker: unsupported api_key {api_key}")
