"""ctypes bindings for the native host data plane (libtpurecsys).

Builds the shared library on first import if missing (g++ -O3; no external
deps). See ``src/tpurecsys.cc`` for the C ABI and reference citations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [
    os.path.join(_DIR, "src", "tpurecsys.cc"),
    os.path.join(_DIR, "src", "hnsw.cc"),
    os.path.join(_DIR, "src", "serving_core.cc"),
]
_SO = os.path.join(_DIR, "libtpurecsys.so")

_lib = None


def _build() -> None:
    subprocess.run(
        [
            "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
            "-o", _SO, *_SRCS,
        ],
        check=True,
        capture_output=True,
    )


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < max(
            os.path.getmtime(s) for s in _SRCS
        ):
            _build()
        _lib = ctypes.CDLL(_SO)
        _declare(_lib)
    return _lib


def _declare(L: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    L.tpurecsys_murmur3_x64_128.argtypes = [
        u8p, ctypes.c_uint64, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    L.tpurecsys_feature_id.restype = ctypes.c_int64
    L.tpurecsys_feature_id.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    L.tpurecsys_multiplicative_hash.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_uint64, ctypes.c_uint64,
    ]
    L.tpurecsys_encode_block.restype = ctypes.c_uint64
    L.tpurecsys_block_num_records.restype = ctypes.c_uint32
    L.tpurecsys_block_totals.restype = ctypes.c_int
    L.tpurecsys_decode_block.restype = ctypes.c_int
    L.tpurecsys_densify.restype = ctypes.c_int
    L.tpurecsys_densify_labels.restype = ctypes.c_int
    L.tpurecsys_hash_discretize.restype = ctypes.c_int
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    L.tpurecsys_hnsw_create.restype = ctypes.c_void_p
    L.tpurecsys_hnsw_create.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint64,
    ]
    L.tpurecsys_hnsw_free.argtypes = [ctypes.c_void_p]
    L.tpurecsys_hnsw_size.restype = ctypes.c_uint64
    L.tpurecsys_hnsw_size.argtypes = [ctypes.c_void_p]
    L.tpurecsys_hnsw_insert.restype = ctypes.c_int32
    L.tpurecsys_hnsw_insert.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int64]
    L.tpurecsys_hnsw_insert_batch.argtypes = [
        ctypes.c_void_p, f32p, i64p, ctypes.c_uint64,
    ]
    L.tpurecsys_hnsw_search.restype = ctypes.c_int32
    L.tpurecsys_hnsw_search.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_int32, ctypes.c_int32, i64p, f32p,
    ]
    L.tpurecsys_hnsw_save.restype = ctypes.c_int
    L.tpurecsys_hnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    L.tpurecsys_hnsw_load.restype = ctypes.c_void_p
    L.tpurecsys_hnsw_load.argtypes = [ctypes.c_char_p]
    # serving core (navi-equivalent socket front + batcher)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    L.sc_start.restype = ctypes.c_void_p
    L.sc_start.argtypes = [
        ctypes.c_int, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_int64,
    ]
    L.sc_port.restype = ctypes.c_int
    L.sc_port.argtypes = [ctypes.c_void_p]
    L.sc_next_batch.restype = ctypes.c_int
    L.sc_next_batch.argtypes = [
        ctypes.c_void_p, f32p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    L.sc_complete.restype = ctypes.c_int
    L.sc_complete.argtypes = [ctypes.c_void_p, ctypes.c_int64, f32p]
    L.sc_stats.argtypes = [ctypes.c_void_p, u64p]
    L.sc_stop.argtypes = [ctypes.c_void_p]


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def murmur3_x64_128(data: bytes, seed: int = 0) -> Tuple[int, int]:
    buf = np.frombuffer(data, np.uint8) if data else np.zeros(0, np.uint8)
    out = (ctypes.c_uint64 * 2)()
    lib().tpurecsys_murmur3_x64_128(
        _u8(np.ascontiguousarray(buf)), len(data), seed, out
    )
    return int(out[0]), int(out[1])


def feature_id(name: str) -> int:
    raw = name.encode("utf-8")
    return int(lib().tpurecsys_feature_id(raw, len(raw)))


def multiplicative_hash(
    feature_ids: np.ndarray, buckets: np.ndarray, output_bits: int
) -> np.ndarray:
    f = np.ascontiguousarray(feature_ids.reshape(-1), np.int64)
    b = np.ascontiguousarray(buckets.reshape(-1), np.int64)
    out = np.empty(f.shape[0], np.int32)
    lib().tpurecsys_multiplicative_hash(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        f.shape[0], output_bits,
    )
    return out.reshape(feature_ids.shape)


# -- TRec block codec --------------------------------------------------------


def encode_block(
    records: list,  # list of (cont: {fid: val}, labels: {fid: val})
) -> bytes:
    """Encode python records → TRec block bytes (C++ does the packing)."""
    cont_f, cont_v, cont_off = [], [], [0]
    lab_f, lab_v, lab_off = [], [], [0]
    for cont, labels in records:
        for k, v in cont.items():
            cont_f.append(k)
            cont_v.append(v)
        cont_off.append(len(cont_f))
        for k, v in labels.items():
            lab_f.append(k)
            lab_v.append(v)
        lab_off.append(len(lab_f))

    cf = np.asarray(cont_f, np.int64)
    cv = np.asarray(cont_v, np.float32)
    co = np.asarray(cont_off, np.uint32)
    lf = np.asarray(lab_f, np.int64)
    lv = np.asarray(lab_v, np.float32)
    lo = np.asarray(lab_off, np.uint32)
    n = len(records)

    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    args = (
        cf.ctypes.data_as(i64p), cv.ctypes.data_as(f32p), co.ctypes.data_as(u32p),
        lf.ctypes.data_as(i64p), lv.ctypes.data_as(f32p), lo.ctypes.data_as(u32p),
        n,
    )
    need = lib().tpurecsys_encode_block(*args, None, 0)
    out = np.empty(need, np.uint8)
    wrote = lib().tpurecsys_encode_block(*args, _u8(out), need)
    assert wrote == need
    return out.tobytes()


def decode_block(buf: bytes):
    """TRec block bytes → list of (cont dict, label dict)."""
    if len(buf) < 8 or buf[:4] != b"TREC":
        raise ValueError("corrupt TRec block (bad magic)")
    arr = np.frombuffer(buf, np.uint8)
    L = lib()
    n = L.tpurecsys_block_num_records(_u8(arr), len(buf))
    tc = ctypes.c_uint64()
    tl = ctypes.c_uint64()
    ok = L.tpurecsys_block_totals(
        _u8(arr), len(buf), ctypes.byref(tc), ctypes.byref(tl)
    )
    if not ok:
        raise ValueError("corrupt TRec block")
    cf = np.empty(tc.value, np.int64)
    cv = np.empty(tc.value, np.float32)
    co = np.empty(n + 1, np.uint32)
    lf = np.empty(tl.value, np.int64)
    lv = np.empty(tl.value, np.float32)
    lo = np.empty(n + 1, np.uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    L.tpurecsys_decode_block(
        _u8(arr), len(buf),
        cf.ctypes.data_as(i64p), cv.ctypes.data_as(f32p), co.ctypes.data_as(u32p),
        lf.ctypes.data_as(i64p), lv.ctypes.data_as(f32p), lo.ctypes.data_as(u32p),
    )
    out = []
    for r in range(n):
        cont = {
            int(cf[i]): float(cv[i]) for i in range(co[r], co[r + 1])
        }
        labels = {
            int(lf[i]): float(lv[i]) for i in range(lo[r], lo[r + 1])
        }
        out.append((cont, labels))
    return out


def densify(buf: bytes, vocab: np.ndarray):
    """TRec block → ([n, |vocab|] values, mask). vocab sorted int64."""
    arr = np.frombuffer(buf, np.uint8)
    L = lib()
    n = L.tpurecsys_block_num_records(_u8(arr), len(buf))
    v = np.ascontiguousarray(vocab, np.int64)
    values = np.zeros((n, v.shape[0]), np.float32)
    mask = np.zeros((n, v.shape[0]), np.uint8)
    L.tpurecsys_densify(
        _u8(arr), len(buf),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), v.shape[0],
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return values, mask.astype(bool)


def densify_labels(buf: bytes, vocab: np.ndarray):
    """TRec block label section → ([n, |vocab|] values, mask)."""
    arr = np.frombuffer(buf, np.uint8)
    L = lib()
    n = L.tpurecsys_block_num_records(_u8(arr), len(buf))
    v = np.ascontiguousarray(vocab, np.int64)
    values = np.zeros((n, v.shape[0]), np.float32)
    mask = np.zeros((n, v.shape[0]), np.uint8)
    L.tpurecsys_densify_labels(
        _u8(arr), len(buf),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), v.shape[0],
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return values, mask.astype(bool)


def hash_discretize(
    buf: bytes,
    vocab: np.ndarray,  # sorted int64 [F]
    bin_vals: np.ndarray,  # [F, n_bins-1] float32 (row order = vocab order)
    output_bits: int,
    max_width: int,
):
    """TRec block → hashed sparse batch (indices, values, mask) in C++."""
    arr = np.frombuffer(buf, np.uint8)
    L = lib()
    n = L.tpurecsys_block_num_records(_u8(arr), len(buf))
    v = np.ascontiguousarray(vocab, np.int64)
    b = np.ascontiguousarray(bin_vals, np.float32)
    indices = np.zeros((n, max_width), np.int32)
    values = np.zeros((n, max_width), np.float32)
    mask = np.zeros((n, max_width), np.uint8)
    L.tpurecsys_hash_discretize(
        _u8(arr), len(buf),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), v.shape[0],
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b.shape[1],
        output_bits, max_width,
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return indices, values, mask.astype(bool)
