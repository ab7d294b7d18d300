"""Multimodal column plumbing (image/audio treated as opaque binary + metadata).

The container has no codec libraries, so the *decode* kernel is stubbed: a
deterministic fake header parse (documented below), with the real-codec entry
point raising ``NotImplementedError``.  Everything around it — binary column
schema, actor-pool decode stage, small-batch sizing for wide rows, typed
metadata output, feature layout — is real and tested; swapping in a real
decoder is a one-function change.

Fake payload format (deterministic from the documents table, so the DuckDB
oracle can recompute the metadata from ``strlen(text)``):

    bytes 0..3   magic ``FAKE``
    bytes 4..7   big-endian uint32 payload length (len(utf8(text)))
    bytes 8..    the utf-8 text bytes

Decoded metadata: ``n_bytes = 8 + len``, ``width = 16 + len % 64``,
``height = 16 + (len * 7) % 64``, ``n_frames = 1 + len % 8``.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

BINARY_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("payload", pa.binary()), ("media_type", pa.string())]
)


def attach_binary_payload(docs: rd.Dataset) -> rd.Dataset:
    """documents -> {doc_id, payload: binary, media_type} (fake encode)."""

    def enc(t: pa.Table) -> pa.Table:
        payloads = []
        for x in t["text"].to_pylist():
            b = x.encode("utf-8")
            payloads.append(b"FAKE" + struct.pack(">I", len(b)) + b)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(["image/fake"] * t.num_rows),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(enc, batch_format="pyarrow")


class DecodeStage:
    """Actor-pool decode: header parse -> typed metadata (+ fake feature vec).

    Real decoding would load the codec in ``__init__`` (once per actor) and
    decode per batch; small ``batch_size`` keeps batch x concurrency of wide
    binary rows inside worker heaps.  ``real=True`` raises — no codec libs in
    this environment.
    """

    def __init__(self, real: bool = False, feature_dim: int = 8):
        if real:
            raise NotImplementedError("no image/audio codecs in this environment; use real=False")
        self.feature_dim = feature_dim

    def __call__(self, t: pa.Table) -> pa.Table:
        n_bytes, widths, heights, frames, feats = [], [], [], [], []
        for buf in t["payload"].to_pylist():
            assert buf[:4] == b"FAKE", "bad magic"
            (ln,) = struct.unpack(">I", buf[4:8])
            n_bytes.append(8 + ln)
            widths.append(16 + ln % 64)
            heights.append(16 + (ln * 7) % 64)
            frames.append(1 + ln % 8)
            # deterministic fake feature: byte histogram projection
            arr = np.frombuffer(buf[8:], dtype=np.uint8)
            f = np.bincount(arr % self.feature_dim, minlength=self.feature_dim).astype(np.float32)
            feats.append(f / max(1.0, f.sum()))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "n_frames": pa.array(frames, pa.int64()),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


def decode_metadata(binary_ds: rd.Dataset, *, concurrency=(1, 4), batch_size: int = 256) -> rd.Dataset:
    """Binary column -> typed metadata via the actor-pool decode stage."""
    return binary_ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"real": False},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: rows are wide binary
        concurrency=concurrency,
    )


class ResizeStage:
    """Actor-pool resize: aspect-preserving fit into ``(max_w, max_h)``.

    The pixel resample itself is stubbed (``real=True`` raises — no image
    libs here); the Ray-side contract is real: metadata-in/metadata-out with
    the exact output dims + scale a real resampler would produce, small
    batches for wide rows, per-actor setup in ``__init__``.
    """

    def __init__(self, max_w: int = 32, max_h: int = 32, real: bool = False):
        if real:
            raise NotImplementedError("no image codecs in this environment; use real=False")
        self.max_w = int(max_w)
        self.max_h = int(max_h)

    def __call__(self, t: pa.Table) -> pa.Table:
        w = t["width"].to_numpy().astype(np.float64)
        h = t["height"].to_numpy().astype(np.float64)
        scale = np.minimum(1.0, np.minimum(self.max_w / w, self.max_h / h))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "width": pa.array(np.floor(w * scale + 0.5).astype(np.int64)),
                "height": pa.array(np.floor(h * scale + 0.5).astype(np.int64)),
                "scale_u": pa.array(np.floor(scale * 1e6 + 0.5).astype(np.int64)),
            }
        )


def resize(decoded: rd.Dataset, *, max_w: int = 32, max_h: int = 32,
           concurrency=(1, 4), batch_size: int = 256) -> rd.Dataset:
    """Decoded metadata -> resized dims {doc_id, width, height, scale_u}."""
    return decoded.select_columns(["doc_id", "width", "height"]).map_batches(
        ResizeStage,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample(decoded: rd.Dataset, *, every: int = 2) -> rd.Dataset:
    """Frame-sampling stub: expand each item to its sampled frame indices."""

    def stage(t: pa.Table) -> pa.Table:
        doc_ids, frame_idx = [], []
        for d, nf in zip(t["doc_id"].to_pylist(), t["n_frames"].to_pylist()):
            idx = list(range(0, nf, every))
            doc_ids.extend([d] * len(idx))
            frame_idx.extend(idx)
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()), "frame": pa.array(frame_idx, pa.int64())}
        )

    return decoded.select_columns(["doc_id", "n_frames"]).map_batches(stage, batch_format="pyarrow")
