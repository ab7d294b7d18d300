"""Multimodal column plumbing (image/audio treated as opaque binary + metadata).

The *decode* kernel has two paths: the default deterministic fake header
parse (documented below; oracle-checked, works in codec-free containers),
and ``real=True``, which loads Pillow once per actor in ``__init__`` and
decodes genuine image bytes — raising ``NotImplementedError`` at pool
construction when Pillow isn't importable.  Everything around it — binary
column schema, actor-pool decode stage, small-batch sizing for wide rows,
typed metadata output, feature layout — is identical between the paths and
tested (the Pillow path skips where the library is absent).

Fake payload format (deterministic from the documents table, so the DuckDB
oracle can recompute the metadata from ``strlen(text)``):

    bytes 0..3   magic ``FAKE``
    bytes 4..7   big-endian uint32 payload length (len(utf8(text)))
    bytes 8..    the utf-8 text bytes

Decoded metadata: ``n_bytes = 8 + len``, ``width = 16 + len % 64``,
``height = 16 + (len * 7) % 64``, ``n_frames = 1 + len % 8``.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.agg import actor_pool_args

BINARY_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("payload", pa.binary()), ("media_type", pa.string())]
)



def _seg_positions(lens: np.ndarray):
    """``(row_id, rel)`` for the concatenation of per-row segments of the
    given lengths: the owning row of each flat element and its offset WITHIN
    its segment.  One definition of the flat-buffer expansion math shared by
    the encode / decode / feature byte gathers (each adds its own base via
    ``rel + np.repeat(base, lens)``)."""
    row_id = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    csum = np.cumsum(lens) - lens
    rel = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(csum, lens)
    return row_id, rel

def attach_binary_payload(docs: rd.Dataset) -> rd.Dataset:
    """documents -> {doc_id, payload: binary, media_type} (fake encode).

    The encode is vectorized over the Arrow string buffers: headers and
    utf-8 bodies are written into one flat uint8 buffer with repeat/arange
    position arithmetic, then wrapped zero-copy as a BinaryArray."""

    def enc(t: pa.Table) -> pa.Table:
        arr = t["text"].combine_chunks()
        odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        off = np.frombuffer(arr.buffers()[1], dtype=odt)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        lens = np.diff(off)
        n = len(lens)
        out_lens = lens + 8
        starts = np.cumsum(out_lens) - out_lens
        out = np.empty(int(out_lens.sum()), dtype=np.uint8)
        for i, ch in enumerate(b"FAKE"):
            out[starts + i] = ch
        for i, shift in enumerate((24, 16, 8, 0)):  # big-endian uint32 length
            out[starts + 4 + i] = (lens >> shift) & 0xFF
        _, rel = _seg_positions(lens)
        out[rel + np.repeat(starts + 8, lens)] = data[rel + np.repeat(off[:-1], lens)]
        new_off = np.concatenate([[0], np.cumsum(out_lens)])
        # py_buffer wraps the ndarrays via the buffer protocol (and keeps
        # them alive) — .tobytes() here would copy the whole payload twice
        if new_off[-1] <= np.iinfo(np.int32).max:
            payload = pa.BinaryArray.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(new_off.astype(np.int32)), pa.py_buffer(out)],
            )
        else:
            payload = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(), n,
                [None, pa.py_buffer(new_off), pa.py_buffer(out)],
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": payload,
                "media_type": pa.array(["image/fake"] * n, pa.string()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(enc, batch_format="pyarrow")


def _payload_bytes(t: pa.Table):
    """Zero-copy view of a binary column: (flat uint8 data, int offsets)."""
    arr = t["payload"].combine_chunks()
    odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=odt)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data, off.astype(np.int64)


class DecodeStage:
    """Actor-pool decode: payload -> typed metadata (+ feature vec).

    ``real=False`` (default): deterministic FAKE-header parse, vectorized
    over the Arrow binary buffer (no per-row Python) — the oracle-checked
    path in this codec-free container.

    ``real=True``: decodes genuine image bytes with Pillow, loaded ONCE per
    actor here in ``__init__`` (the actor-pool contract for stateful codec
    setup).  Raises ``NotImplementedError`` when Pillow is not importable,
    so environments without codecs fail loudly at pool construction instead
    of mid-stream.  The per-item ``Image.open`` call is C-bound decode work;
    the Python loop around it is noise next to the decode itself.
    """

    def __init__(self, real: bool = False, feature_dim: int = 8):
        self.real = bool(real)
        self.feature_dim = int(feature_dim)
        if real:
            try:
                from PIL import Image  # optional dependency, probed per actor
            except ImportError as e:  # pragma: no cover - exercised via raises test
                raise NotImplementedError(
                    "real decode needs Pillow (pip install pillow); "
                    "use real=False for the deterministic fake-header path"
                ) from e
            self._Image = Image

    def _call_real(self, t: pa.Table) -> pa.Table:
        """Pillow path: width/height/frame-count from the actual image."""
        import io

        data, off = _payload_bytes(t)
        d = self.feature_dim
        widths, heights, frames, nbytes, feats = [], [], [], [], []
        for i in range(len(off) - 1):
            raw = bytes(data[off[i] : off[i + 1]])
            nbytes.append(len(raw))
            with self._Image.open(io.BytesIO(raw)) as im:
                widths.append(im.width)
                heights.append(im.height)
                frames.append(int(getattr(im, "n_frames", 1)))
                g = np.asarray(im.convert("L"), dtype=np.int64).reshape(-1)
            h = np.bincount((g * d) // 256, minlength=d).astype(np.float32)
            feats.append(h / max(1.0, h.sum()))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pa.array(nbytes, pa.int64()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "n_frames": pa.array(frames, pa.int64()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(feats) if feats else np.array([], np.float32), pa.float32()), d
                ),
            }
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.real:
            return self._call_real(t)
        data, off = _payload_bytes(t)
        starts = off[:-1]
        assert (data[starts] == ord("F")).all() and (data[starts + 1] == ord("A")).all(), "bad magic"
        ln = (
            (data[starts + 4].astype(np.int64) << 24)
            | (data[starts + 5].astype(np.int64) << 16)
            | (data[starts + 6].astype(np.int64) << 8)
            | data[starts + 7].astype(np.int64)
        )
        # fake feature: histogram of body-byte % dim, L1-normalized
        d = self.feature_dim
        n = len(starts)
        body_len = ln
        row_id, rel = _seg_positions(body_len)
        pos = rel + np.repeat(starts + 8, body_len)
        cls = data[pos].astype(np.int64) % d
        counts = np.bincount(row_id * d + cls, minlength=n * d).reshape(n, d).astype(np.float32)
        feats = counts / np.maximum(1.0, counts.sum(axis=1, keepdims=True))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pa.array(8 + ln, pa.int64()),
                "width": pa.array(16 + ln % 64, pa.int64()),
                "height": pa.array(16 + (ln * 7) % 64, pa.int64()),
                "n_frames": pa.array(1 + ln % 8, pa.int64()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), d
                ),
            }
        )


def decode_metadata(
    binary_ds: rd.Dataset, *, real: bool = False, feature_dim: int = 8,
    concurrency=None, batch_size: int = 256,
) -> rd.Dataset:
    """Binary column -> typed metadata via the actor-pool decode stage.
    ``real=True`` forwards to DecodeStage's Pillow path (loaded once per
    actor) — previously unreachable through this public wrapper."""
    pool = {"concurrency": concurrency} if concurrency is not None else actor_pool_args(4)
    return binary_ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"real": real, "feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: rows are wide binary
        **pool,
    )


def compute_resize(w: np.ndarray, h: np.ndarray, max_w: int, max_h: int):
    """Aspect-preserving fit + the engine's quantization, shared by
    ResizeStage and meta_with_resize (one kernel — the oracle pins this
    exact rounding).  Returns (r_width, r_height, scale_u)."""
    w = np.asarray(w, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)
    scale = np.minimum(1.0, np.minimum(max_w / w, max_h / h))
    return (
        np.floor(w * scale + 0.5).astype(np.int64),
        np.floor(h * scale + 0.5).astype(np.int64),
        np.floor(scale * 1e6 + 0.5).astype(np.int64),
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
        rw, rh, su = compute_resize(
            t["width"].to_numpy(), t["height"].to_numpy(), self.max_w, self.max_h
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "width": pa.array(rw),
                "height": pa.array(rh),
                "scale_u": pa.array(su),
            }
        )


def resize(decoded: rd.Dataset, *, max_w: int = 32, max_h: int = 32,
           concurrency=None, batch_size: int = 256) -> rd.Dataset:
    """Decoded metadata -> resized dims {doc_id, width, height, scale_u}."""
    pool = {"concurrency": concurrency} if concurrency is not None else actor_pool_args(4)
    return decoded.select_columns(["doc_id", "width", "height"]).map_batches(
        ResizeStage,
        fn_constructor_kwargs={"max_w": max_w, "max_h": max_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        **pool,
    )


def meta_with_resize(decoded: rd.Dataset, *, max_w: int = 32, max_h: int = 32) -> rd.Dataset:
    """Decoded metadata + the resize plan in one pass: {doc_id, n_bytes,
    width, height, n_frames, r_width, r_height, scale_u}.  Same math as
    ``ResizeStage`` but keeps the decode metadata columns (the driver-facing
    merged query for the meta/resized pair)."""

    def stage(t: pa.Table) -> pa.Table:
        rw, rh, su = compute_resize(
            t["width"].to_numpy(), t["height"].to_numpy(), max_w, max_h
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": t["n_bytes"],
                "width": t["width"],
                "height": t["height"],
                "n_frames": t["n_frames"],
                "r_width": pa.array(rw),
                "r_height": pa.array(rh),
                "scale_u": pa.array(su),
            }
        )

    return decoded.select_columns(
        ["doc_id", "n_bytes", "width", "height", "n_frames"]
    ).map_batches(stage, batch_format="pyarrow")


def frames_and_features(decoded: rd.Dataset, binary_ds: rd.Dataset, *, every: int = 2) -> rd.Dataset:
    """Frame-sample plan ∪ byte-class features as one kind-tagged table
    {doc_id, kind, idx, n, feat_u}: frames carry (idx=frame, n=0, feat_u=0),
    features carry (idx=dim, n, feat_u).  A ``union`` of two streaming
    stages — no shuffle."""
    fr = frame_sample(decoded, every=every).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "kind": pa.array(["frame"] * t.num_rows, pa.string()),
                "idx": t["frame"],
                "n": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "feat_u": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    ft = feature_extract(binary_ds).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "kind": pa.array(["feat"] * t.num_rows, pa.string()),
                "idx": t["dim"],
                "n": t["n"],
                "feat_u": t["feat_u"],
            }
        ),
        batch_format="pyarrow",
    )
    return fr.union(ft)


def frame_sample(decoded: rd.Dataset, *, every: int = 2) -> rd.Dataset:
    """Frame sampling: expand each item to its every-``every``-th frame index
    {doc_id, frame} (a real sampler would additionally slice the payload per
    frame — the codec-free environment stops at the index plan).  Vectorized
    repeat/arange expansion — no per-row Python."""

    def stage(t: pa.Table) -> pa.Table:
        nf = t["n_frames"].to_numpy().astype(np.int64)
        did = t["doc_id"].to_numpy()
        k = (nf + every - 1) // every  # sampled frames per item
        row = np.repeat(np.arange(len(nf), dtype=np.int64), k)
        csum = np.cumsum(k) - k
        frame = (np.arange(int(k.sum()), dtype=np.int64) - np.repeat(csum, k)) * every
        return pa.table(
            {"doc_id": pa.array(did[row], pa.int64()), "frame": pa.array(frame, pa.int64())}
        )

    return decoded.select_columns(["doc_id", "n_frames"]).map_batches(stage, batch_format="pyarrow")


# ASCII byte classes for the feature histogram (index = feature dimension):
# 0 lower, 1 upper, 2 digit, 3 whitespace, 4 other-ASCII, 5 non-ASCII byte.
_N_CLASSES = 6


def _class_lut() -> np.ndarray:
    lut = np.full(256, 4, dtype=np.int64)
    lut[ord("a") : ord("z") + 1] = 0
    lut[ord("A") : ord("Z") + 1] = 1
    lut[ord("0") : ord("9") + 1] = 2
    for b in b" \t\n\r":
        lut[b] = 3
    lut[128:] = 5
    return lut


class FeatureStage:
    """Actor-pool feature extraction from the binary payload: 6-dim byte-class
    histogram (lower/upper/digit/whitespace/other-ASCII/non-ASCII), emitted
    unnested as {doc_id, dim, n, feat_u} with ``feat_u = floor(n/len * 1e6
    + 0.5)`` so DuckDB replays it exactly (regexp class counts on ASCII
    corpora).  A real embedding model would load in ``__init__`` (once per
    actor) and batch-infer in ``__call__``; the histogram kernel is the
    deterministic stand-in with the same Ray plumbing.  Vectorized: one
    lookup-table gather + bincount over the flat payload buffer per batch.
    """

    def __init__(self, real: bool = False):
        if real:
            raise NotImplementedError("no model runtimes in this environment; use real=False")
        self.lut = _class_lut()

    def __call__(self, t: pa.Table) -> pa.Table:
        data, off = _payload_bytes(t)
        starts = off[:-1]
        ln = off[1:] - starts - 8  # body length (skip the 8-byte fake header)
        n = len(starts)
        row_id, rel = _seg_positions(ln)
        pos = rel + np.repeat(starts + 8, ln)
        cls = self.lut[data[pos]]
        counts = np.bincount(row_id * _N_CLASSES + cls, minlength=n * _N_CLASSES).reshape(
            n, _N_CLASSES
        )
        ratio = counts / np.maximum(ln, 1)[:, None]
        did = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(did, _N_CLASSES), pa.int64()),
                "dim": pa.array(np.tile(np.arange(_N_CLASSES, dtype=np.int64), n)),
                "n": pa.array(counts.reshape(-1), pa.int64()),
                "feat_u": pa.array(
                    np.floor(ratio.reshape(-1) * 1e6 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )


def feature_extract(binary_ds: rd.Dataset, *, concurrency=None, batch_size: int = 256) -> rd.Dataset:
    """Binary payload -> unnested feature histogram {doc_id, dim, n, feat_u}."""
    pool = {"concurrency": concurrency} if concurrency is not None else actor_pool_args(4)
    return binary_ds.map_batches(
        FeatureStage,
        fn_constructor_kwargs={"real": False},
        batch_format="pyarrow",
        batch_size=batch_size,
        **pool,
    )
