"""Minimal BSON + MongoDB OP_MSG wire codec (pure stdlib).

The reference ships a mongodb sink connector as a docker image speaking
the MongoDB wire protocol (conf/hstream.yaml:141, hstream-io sink-mongodb).
MongoDB's protocol is binary — there is no stdlib client — so this module
implements the small subset the sink needs from the PUBLIC protocol specs:

- BSON (bsonspec.org, spec version 1.1): encode/decode of the types a
  JSON-shaped row can carry — double (0x01), string (0x02), embedded
  document (0x03), array (0x04), binary (0x05), bool (0x08), UTC
  datetime (0x09), null (0x0A), int32 (0x10), int64 (0x12).
- OP_MSG (MongoDB wire protocol ≥3.6, opcode 2013): header + flagBits +
  one kind-0 body section carrying a command document. The sink issues
  ``{"insert": <coll>, "$db": <db>, "documents": [...]}`` commands and
  checks ``ok`` in the reply — the same exchange the official drivers
  perform for inserts.

Everything here is driver/executor-side I/O plumbing, not a row
transform: rows are JSON-encoded JVM-side (``to_json``) and only the
encoded strings cross into Python, exactly like the elasticsearch
``_bulk`` sink.
"""

from __future__ import annotations

import datetime as _dt
import socket
import struct
from typing import Any, Optional

OP_MSG = 2013


# ---------------------------------------------------------------------------
# BSON encode
# ---------------------------------------------------------------------------


def _enc_cstring(s: str) -> bytes:
    b = s.encode("utf-8")
    if b"\x00" in b:
        raise ValueError("BSON cstring cannot contain NUL")
    return b + b"\x00"


def _enc_string(s: str) -> bytes:
    b = s.encode("utf-8") + b"\x00"
    return struct.pack("<i", len(b)) + b


class Int64(int):
    """Marker for values that MUST encode as BSON int64 (0x12) regardless
    of magnitude.  MongoDB requires e.g. the getMore cursor id to be
    int64; real servers reject an int32-encoded cursor id with
    TypeMismatch whenever the server-assigned id happens to fit 32 bits,
    so callers wrap such fields explicitly."""

    __slots__ = ()


def _enc_element(name: str, value: Any) -> bytes:
    key = _enc_cstring(name)
    if value is None:
        return b"\x0a" + key
    if isinstance(value, bool):  # before int: bool is an int subclass
        return b"\x08" + key + (b"\x01" if value else b"\x00")
    if isinstance(value, Int64):
        if -(2**63) <= value < 2**63:
            return b"\x12" + key + struct.pack("<q", value)
        raise ValueError(f"integer out of int64 range: {value}")
    if isinstance(value, int):
        if -(2**31) <= value < 2**31:
            return b"\x10" + key + struct.pack("<i", value)
        if -(2**63) <= value < 2**63:
            return b"\x12" + key + struct.pack("<q", value)
        raise ValueError(f"integer out of int64 range: {value}")
    if isinstance(value, float):
        return b"\x01" + key + struct.pack("<d", value)
    if isinstance(value, str):
        return b"\x02" + key + _enc_string(value)
    if isinstance(value, (bytes, bytearray)):
        raw = bytes(value)
        return b"\x05" + key + struct.pack("<i", len(raw)) + b"\x00" + raw
    if isinstance(value, _dt.datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=_dt.timezone.utc)
        ms = int(value.timestamp() * 1000)
        return b"\x09" + key + struct.pack("<q", ms)
    if isinstance(value, dict):
        return b"\x03" + key + encode_document(value)
    if isinstance(value, (list, tuple)):
        doc = {str(i): v for i, v in enumerate(value)}
        return b"\x04" + key + encode_document(doc)
    raise TypeError(f"unsupported BSON type: {type(value).__name__}")


def encode_document(doc: dict) -> bytes:
    body = b"".join(_enc_element(str(k), v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


# ---------------------------------------------------------------------------
# BSON decode
# ---------------------------------------------------------------------------


def decode_document(buf: bytes, offset: int = 0) -> tuple[dict, int]:
    """Decode one document starting at ``offset``; returns (doc, next_offset)."""
    (doclen,) = struct.unpack_from("<i", buf, offset)
    end = offset + doclen - 1  # position of trailing NUL
    pos = offset + 4
    out: dict[str, Any] = {}
    while pos < end:
        tcode = buf[pos]
        pos += 1
        nul = buf.index(b"\x00", pos)
        name = buf[pos:nul].decode("utf-8")
        pos = nul + 1
        if tcode == 0x01:
            (val,) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif tcode == 0x02:
            (slen,) = struct.unpack_from("<i", buf, pos)
            val = buf[pos + 4 : pos + 4 + slen - 1].decode("utf-8")
            pos += 4 + slen
        elif tcode == 0x03:
            val, pos = decode_document(buf, pos)
        elif tcode == 0x04:
            sub, pos = decode_document(buf, pos)
            val = [sub[str(i)] for i in range(len(sub))]
        elif tcode == 0x05:
            (blen,) = struct.unpack_from("<i", buf, pos)
            val = buf[pos + 5 : pos + 5 + blen]
            pos += 5 + blen
        elif tcode == 0x08:
            val = buf[pos] != 0
            pos += 1
        elif tcode == 0x09:
            (ms,) = struct.unpack_from("<q", buf, pos)
            val = _dt.datetime.fromtimestamp(ms / 1000.0, tz=_dt.timezone.utc)
            pos += 8
        elif tcode == 0x0A:
            val = None
        elif tcode == 0x10:
            (val,) = struct.unpack_from("<i", buf, pos)
            pos += 4
        elif tcode == 0x12:
            (val,) = struct.unpack_from("<q", buf, pos)
            pos += 8
        else:
            raise ValueError(f"unsupported BSON type byte 0x{tcode:02x} for {name!r}")
        out[name] = val
    return out, end + 1


# ---------------------------------------------------------------------------
# OP_MSG framing
# ---------------------------------------------------------------------------


def encode_op_msg(command: dict, request_id: int = 1) -> bytes:
    """Frame a command document as an OP_MSG (flagBits=0, one kind-0 section)."""
    body = b"\x00\x00\x00\x00" + b"\x00" + encode_document(command)
    header = struct.pack("<iiii", 16 + len(body), request_id, 0, OP_MSG)
    return header + body


def decode_op_msg(frame: bytes) -> dict:
    """Decode an OP_MSG frame (header already stripped of nothing —
    ``frame`` is the full message including the 16-byte header)."""
    length, request_id, response_to, opcode = struct.unpack_from("<iiii", frame, 0)
    if opcode != OP_MSG:
        raise ValueError(f"expected OP_MSG (2013), got opcode {opcode}")
    pos = 16 + 4  # skip flagBits
    doc: dict = {}
    while pos < length:
        kind = frame[pos]
        pos += 1
        if kind == 0:
            sub, pos = decode_document(frame, pos)
            doc.update(sub)
        elif kind == 1:
            # document-sequence section: size, identifier cstring, docs
            (size,) = struct.unpack_from("<i", frame, pos)
            send = pos + size
            nul = frame.index(b"\x00", pos + 4)
            ident = frame[pos + 4 : nul].decode("utf-8")
            p = nul + 1
            seq = []
            while p < send:
                d, p = decode_document(frame, p)
                seq.append(d)
            doc[ident] = seq
            pos = send
        else:
            raise ValueError(f"unknown OP_MSG section kind {kind}")
    return doc


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n > 0:
        chunk = sock.recv(n)
        if not chunk:
            raise ConnectionError("socket closed mid-message")
        chunks.append(chunk)
        n -= len(chunk)
    return b"".join(chunks)


def read_message(sock: socket.socket) -> Optional[bytes]:
    """Read one complete wire message (header + body); None on clean EOF."""
    head = b""
    while len(head) < 4:
        chunk = sock.recv(4 - len(head))
        if not chunk:
            if head:
                raise ConnectionError("socket closed mid-header")
            return None
        head += chunk
    (length,) = struct.unpack("<i", head)
    return head + _recv_exact(sock, length - 4)


def send_command(sock: socket.socket, command: dict, request_id: int = 1) -> dict:
    """Send one OP_MSG command and return the decoded reply document."""
    sock.sendall(encode_op_msg(command, request_id))
    reply = read_message(sock)
    if reply is None:
        raise ConnectionError("server closed connection before replying")
    return decode_op_msg(reply)


class MongoAuthError(RuntimeError):
    pass


def authenticate(
    sock: socket.socket,
    username: str,
    password: str,
    mechanism: str = "SCRAM-SHA-256",
    auth_db: str = "admin",
) -> None:
    """MongoDB SASL authentication: the saslStart/saslContinue command
    exchange over OP_MSG (public spec: the MongoDB SCRAM auth
    conversation) with SCRAM-SHA-256 (server default since 4.0) or
    SCRAM-SHA-1. The RFC 5802 client half is shared with the Kafka
    wire module (``kafka_wire.ScramClient``) — same spec, same code.

    Password preparation per the Mongo spec: SCRAM-SHA-1 hashes the
    credential as hex(md5("user:mongo:pwd")); SCRAM-SHA-256 applies
    RFC 4013 SASLprep (kafka_wire.saslprep — NFKC unification,
    prohibited-character rejection) inside the shared ScramClient."""
    import hashlib

    from hstream_spark.sources.kafka_wire import KafkaWireError, ScramClient

    mech = mechanism.upper()
    if mech == "SCRAM-SHA-1":
        prepped = hashlib.md5(
            f"{username}:mongo:{password}".encode("utf-8")
        ).hexdigest()
    elif mech == "SCRAM-SHA-256":
        # ScramClient SASLpreps internally (RFC 4013 via stdlib
        # stringprep) — non-ASCII passwords normalize instead of
        # erroring; prohibited characters still raise loudly
        prepped = password
    else:
        raise MongoAuthError(
            f"unsupported mongodb auth mechanism {mechanism!r}; "
            "use SCRAM-SHA-256 or SCRAM-SHA-1"
        )

    def _ok(reply: dict, what: str) -> dict:
        if reply.get("ok") not in (1, 1.0):
            raise MongoAuthError(
                f"mongodb {what} failed for user {username!r}: "
                f"{reply.get('errmsg') or reply.get('codeName') or reply}"
            )
        return reply

    try:
        sc = ScramClient(mech, username, prepped)
        r1 = _ok(
            send_command(
                sock,
                {
                    "saslStart": 1,
                    "mechanism": mech,
                    "payload": sc.first_message(),
                    "options": {"skipEmptyExchange": True},
                    "$db": auth_db,
                },
                request_id=900001,
            ),
            "saslStart",
        )
        cid = r1.get("conversationId", 1)
        r2 = _ok(
            send_command(
                sock,
                {
                    "saslContinue": 1,
                    "conversationId": cid,
                    "payload": sc.final_message(bytes(r1.get("payload") or b"")),
                    "$db": auth_db,
                },
                request_id=900002,
            ),
            "authentication",
        )
        sc.verify_server_final(bytes(r2.get("payload") or b""))
        if not r2.get("done"):
            # server skipped skipEmptyExchange: one final empty round
            _ok(
                send_command(
                    sock,
                    {
                        "saslContinue": 1,
                        "conversationId": cid,
                        "payload": b"",
                        "$db": auth_db,
                    },
                    request_id=900003,
                ),
                "authentication finalize",
            )
    except KafkaWireError as exc:  # SCRAM-layer failure (nonce/signature)
        raise MongoAuthError(str(exc)) from exc
    except (ValueError, KeyError, UnicodeDecodeError) as exc:
        # a missing/malformed server SCRAM payload must surface as an
        # auth error, not a raw dict-construction traceback
        raise MongoAuthError(
            f"malformed SCRAM challenge from server during {mech} "
            f"authentication: {exc!r}"
        ) from exc
