"""Block-format DataRecord files + streaming per-host input pipeline.

≡ twml's DataRecordTrainer input path — ``BlockFormatDatasetV2`` +
``DecodeDataRecord`` C++ ops feeding ``get_train_input_fn`` batches
(``twml/twml/trainers/data_record_trainer.py:533-610``,
``twml/libtwml/src/ops/block_format_dataset.cpp``, ``ops/data_record.cpp``).

TPU re-design: files hold length-prefixed TRec blocks; all record parsing and
densification is the C++ codec (``native/src/tpurecsys.cc`` — block decode,
segdense-style vocab densify, bit-identical hashing discretizer); the Python
layer only frames files, shards them per host, and assembles fixed-size
batches. Determinism: file order and per-epoch shuffles derive from a seed +
epoch counter only, so every host produces the same global batch sequence for
a given (seed, num_hosts) — the reproducible-AUC requirement in SURVEY §7.
"""

from __future__ import annotations

import dataclasses
import os
import struct
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from the_algorithm_tpu import native

_LEN = struct.Struct("<I")  # u32 little-endian block length prefix


# -- file framing -------------------------------------------------------------


def write_trec_file(path: str, blocks: Sequence[bytes]) -> None:
    """Write length-prefixed TRec blocks; atomic via tmp+rename."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        for b in blocks:
            f.write(_LEN.pack(len(b)))
            f.write(b)
    os.replace(tmp, path)


def write_records(
    path: str,
    records: Sequence,  # [(cont: {fid: val}, labels: {fid: val})]
    block_size: int = 256,
) -> None:
    """Encode records into blocks of ``block_size`` and write one file."""
    blocks = [
        native.encode_block(list(records[i : i + block_size]))
        for i in range(0, len(records), block_size)
    ]
    write_trec_file(path, blocks)


def iter_file_blocks(path: str) -> Iterator[bytes]:
    """Stream raw block bytes from a file (no full-file buffering)."""
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if not head:
                return
            if len(head) != 4:
                raise ValueError(f"truncated block header in {path}")
            (n,) = _LEN.unpack(head)
            block = f.read(n)
            if len(block) != n:
                raise ValueError(f"truncated block body in {path}")
            yield block


# -- batch transforms (block bytes → dict of per-record arrays) ---------------

Transform = Callable[[bytes], Dict[str, np.ndarray]]


def densify_transform(
    feature_vocab: np.ndarray,  # sorted int64 [F]
    label_vocab: Optional[np.ndarray] = None,  # sorted int64 [H]
    with_masks: bool = False,
) -> Transform:
    """Dense [n, F] values (+ labels) per block — the segdense path."""

    def fn(block: bytes) -> Dict[str, np.ndarray]:
        values, mask = native.densify(block, feature_vocab)
        out = {"values": values}
        if with_masks:
            out["mask"] = mask
        if label_vocab is not None:
            labels, _ = native.densify_labels(block, label_vocab)
            out["labels"] = labels
        return out

    return fn


def hashed_lr_transform(
    feature_vocab: np.ndarray,  # sorted int64 [F]
    bin_vals: np.ndarray,  # [F, n_bins-1] float32, vocab row order
    output_bits: int,
    max_width: int,
    label_vocab: Optional[np.ndarray] = None,
) -> Transform:
    """Hashed-discretized sparse batch per block — the full_sparse LR path.

    Hashing runs in C++ with the same multiplicative-hash semantics as the
    device path (bit-identical; cross-checked in tests/test_native.py).
    """

    def fn(block: bytes) -> Dict[str, np.ndarray]:
        idx, vals, mask = native.hash_discretize(
            block, feature_vocab, bin_vals, output_bits, max_width
        )
        out = {"indices": idx, "sparse_values": vals, "sparse_mask": mask}
        if label_vocab is not None:
            labels, _ = native.densify_labels(block, label_vocab)
            out["labels"] = labels
        return out

    return fn


# -- the dataset --------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TRecDataset:
    """Deterministic, per-host-sharded stream over TRec block files.

    ``paths`` are sorted then striped ``host_id::num_hosts`` (the per-host
    input sharding of the reference's HDFS file splits); each epoch shuffles
    this host's files with ``default_rng(seed + epoch)``.
    """

    paths: Sequence[str]
    host_id: int = 0
    num_hosts: int = 1
    seed: int = 0

    def host_paths(self) -> List[str]:
        ordered = sorted(self.paths)
        mine = ordered[self.host_id :: self.num_hosts]
        if not mine:
            raise ValueError(
                f"host {self.host_id}/{self.num_hosts} got 0 of "
                f"{len(ordered)} files"
            )
        return mine

    def blocks(self, num_epochs: Optional[int] = None) -> Iterator[bytes]:
        epoch = 0
        mine = self.host_paths()
        while num_epochs is None or epoch < num_epochs:
            order = np.random.default_rng(self.seed + epoch).permutation(
                len(mine)
            )
            for i in order:
                yield from iter_file_blocks(mine[int(i)])
            epoch += 1

    def batches(
        self,
        batch_size: int,
        transform: Transform,
        *,
        num_epochs: Optional[int] = None,
        drop_remainder: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Fixed-size batches assembled across block boundaries.

        Blocks decode in C++ to array shards; shards concatenate into exact
        ``batch_size`` rows (static shapes for jit). The remainder of the
        final epoch is dropped unless ``drop_remainder=False`` (then the last
        short batch is emitted as-is — callers must handle the shape).
        """
        pending: List[Dict[str, np.ndarray]] = []
        have = 0
        for block in self.blocks(num_epochs):
            arrs = transform(block)
            n = next(iter(arrs.values())).shape[0]
            pending.append(arrs)
            have += n
            while have >= batch_size:
                cat = {
                    k: np.concatenate([p[k] for p in pending], axis=0)
                    for k in pending[0]
                }
                out = {k: v[:batch_size] for k, v in cat.items()}
                rest = {k: v[batch_size:] for k, v in cat.items()}
                have -= batch_size
                pending = [rest] if have else []
                yield out
        if have and not drop_remainder:
            yield {
                k: np.concatenate([p[k] for p in pending], axis=0)
                for k in pending[0]
            }

    def count_records(self) -> int:
        """One pass over this host's files (host-side bookkeeping only)."""
        total = 0
        for p in self.host_paths():
            for block in iter_file_blocks(p):
                total += len(native.decode_block(block))
        return total
