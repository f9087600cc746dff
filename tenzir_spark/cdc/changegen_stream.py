"""Streamed change-event generator + ground-truth deriver for endurance
runs past what RAM can stage.

``changegen.generate_changes`` materializes the WHOLE event skeleton
(lsn, doc routing, op, every token value) before writing — fine to
~10^8 events, impossible at 10^9+ (the token values alone are ~0.7 TB
at 10^10). This module generates each micro-batch INDEPENDENTLY from a
per-batch seeded RNG plus O(n_docs) carried state, so:

- peak storage = a couple of in-flight batch directories (the endurance
  driver deletes each batch after the engine applies it) — the shape a
  real binlog tail has: the log is never staged in full anywhere;
- peak RAM = one batch's arrays + an int64 winner-lsn array per doc;
- the EXPECTED final table state is derivable without replaying the
  engine: pass 1 records each doc's winning (max) lsn while generating;
  pass 2 regenerates every batch (deterministic per-batch RNG) and
  extracts exactly the winner rows — an independent ground truth the
  engine result is checksum-compared against (scripts/endurance.py
  semantics at 10x the scale).

Adversarial properties match changegen: at-least-once delivery (in-batch
dups + cross-batch redelivery), out-of-order within a batch, strictly
increasing per-partition LSNs, insert/update/delete with never-delete-
first-occurrence, hot-key skew, optional mid-stream schema_change.
The event STREAM differs from generate_changes for the same seed (the
draws are per-batch, not global) — it is its own deterministic fixture,
flagged in the manifest (``generator: "streamed"``).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tenzir_spark.cdc.changegen import SOURCES, _doc_ids

_FMIX_C1 = np.uint64(0xFF51AFD7ED558CCD)
_FMIX_C2 = np.uint64(0xC4CEB9FE1A85EC53)
_FMIX_S = np.uint64(33)


def _fmix64_fill(n: int, base: np.uint64, vocab: int,
                 chunk: int = 8_388_608, workers: int = 16) -> np.ndarray:
    """values[i] = fmix64(base + i) % vocab for i in range(n), computed in
    cache-sized chunks with preallocated scratch on a thread pool."""
    values = np.empty(n, dtype=np.int32)
    if n == 0:
        return values
    tmpl = np.arange(min(chunk, n), dtype=np.uint64)
    vocab64 = np.uint64(vocab)

    def _fill(off: int) -> None:
        m = min(chunk, n - off)
        x = np.empty(m, dtype=np.uint64)
        t = np.empty(m, dtype=np.uint64)
        with np.errstate(over="ignore"):
            np.add(tmpl[:m], base + np.uint64(off), out=x)
            np.right_shift(x, _FMIX_S, out=t)
            np.bitwise_xor(x, t, out=x)
            np.multiply(x, _FMIX_C1, out=x)
            np.right_shift(x, _FMIX_S, out=t)
            np.bitwise_xor(x, t, out=x)
            np.multiply(x, _FMIX_C2, out=x)
            np.right_shift(x, _FMIX_S, out=t)
            np.bitwise_xor(x, t, out=x)
            np.mod(x, vocab64, out=x)
            values[off:off + m] = x

    offs = list(range(0, n, chunk))
    if len(offs) == 1:
        _fill(0)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(workers, len(offs))) as ex:
            list(ex.map(_fill, offs))
    return values


class StreamedChangeGen:
    """Per-batch deterministic generator with O(n_docs) carried state.

    Usage (pass 1 — generate/apply/delete):

        g = StreamedChangeGen(n_events=10**9, n_docs=10**7, ...)
        for b in range(g.n_batches):
            path = g.write_batch(out_dir, b)
            ...apply with the engine...; shutil.rmtree(path)
        g.win_lsn   # per-doc winning lsn (int64, -1 = never seen)

    Pass 2 (ground truth) — ``write_expected`` regenerates each batch and
    keeps only winner rows.
    """

    def __init__(
        self,
        n_events: int,
        n_docs: int,
        n_parts: int = 32,
        n_batches: int = 50,
        seed: int = 42,
        dup_rate: float = 0.03,
        cross_batch_dup_rate: float = 0.01,
        delete_rate: float = 0.06,
        hot_doc_count: int = 4,
        hot_frac: float = 0.15,
        token_len: tuple[int, int] = (64, 256),
        vocab: int = 50_257,
        schema_change_batch: int | None = None,
        compression: str = "zstd",
    ):
        self.n_events = int(n_events)
        self.n_docs = int(n_docs)
        self.n_parts = int(n_parts)
        self.n_batches = int(n_batches)
        self.seed = seed
        self.dup_rate = dup_rate
        self.cross_batch_dup_rate = cross_batch_dup_rate
        self.delete_rate = delete_rate
        self.hot_doc_count = hot_doc_count
        self.hot_frac = hot_frac
        self.token_len = token_len
        self.vocab = vocab
        self.schema_change_batch = schema_change_batch
        # endurance batches live briefly on tmpfs — lz4/none beats zstd's
        # CPU there; zstd stays the default for durable fixtures
        self.compression = compression
        self.epoch_size = max(1, self.n_events // max(self.n_batches, 1))
        self.bounds = np.linspace(0, self.n_events, self.n_batches + 1).astype(np.int64)
        # carried state (pass-1 only; pass 2 rebuilds it batch by batch)
        self.seen = np.zeros(self.n_docs, dtype=bool)
        self.win_lsn = np.full(self.n_docs, -1, dtype=np.int64)
        self.win_deleted = np.zeros(self.n_docs, dtype=bool)
        self._next_batch = 0

    # ------------------------------------------------------------ internals
    def _rng(self, b: int, stream: int) -> np.random.Generator:
        # independent deterministic streams per (batch, purpose): the
        # skeleton (stream 0) must be identical between pass 1 and pass 2;
        # dup/shuffle draws (stream 1) only affect delivery, not truth
        return np.random.default_rng([self.seed, b, stream])

    def _skeleton(self, b: int, seen: np.ndarray):
        """The batch's TRUE events (no dups/shuffle): everything the
        final-state ground truth depends on. ``seen`` is the docs-seen
        state BEFORE this batch; updated in place."""
        lo, hi = int(self.bounds[b]), int(self.bounds[b + 1])
        n = hi - lo
        rng = self._rng(b, 0)
        lsn = np.arange(lo + 1, hi + 1, dtype=np.int64)
        hot = rng.random(n) < self.hot_frac
        doc_idx = np.where(
            hot,
            rng.integers(0, max(self.hot_doc_count, 1), n),
            rng.integers(self.hot_doc_count, max(self.n_docs, self.hot_doc_count + 1), n),
        ).astype(np.int64)
        # first GLOBAL occurrence: not seen before this batch AND first
        # position inside this batch
        _, first_in_batch = np.unique(doc_idx, return_index=True)
        first_pos = np.zeros(n, dtype=bool)
        first_pos[first_in_batch] = True
        first_pos &= ~seen[doc_idx]
        is_delete = (rng.random(n) < self.delete_rate) & ~first_pos
        lengths = rng.integers(self.token_len[0], self.token_len[1] + 1, n).astype(np.int32)
        seen[doc_idx] = True
        return lo, lsn, doc_idx, first_pos, is_delete, lengths, rng

    def _tokens_for(self, b: int, lengths_eff: np.ndarray):
        """Counter-based token values: murmur fmix64 over (seed, batch,
        position). PCG64's bounded-int draw (Lemire rejection, GIL-held,
        unthreadable) was the single biggest generator block (~9-13 s per
        2M-event batch); the mix runs in cache-sized chunks with
        preallocated scratch (whole-array uint64 temporaries fault ~10 GB
        per batch and lose to PCG64 on a fault-degraded host) on a thread
        pool (numpy ufuncs release the GIL) — 2.5x faster than PCG64 on a
        degraded box, more on a healthy one. Identical between pass 1 and
        pass 2: position within the batch is a pure function of the
        skeleton lengths."""
        offsets = np.zeros(len(lengths_eff) + 1, dtype=np.int64)
        np.cumsum(lengths_eff, out=offsets[1:])
        with np.errstate(over="ignore"):  # mod-2^64 wraparound is the point
            base = np.uint64(self.seed) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(
                b + 1) * np.uint64(0xBF58476D1CE4E5B9)
        values = _fmix64_fill(int(offsets[-1]), base, self.vocab)
        return offsets, values

    def _natural_table(self, b: int, lsn, doc_idx, first_pos,
                       is_delete, lengths, offsets, values) -> pa.Table:
        """The batch in NATURAL (lsn) order. The token list array is
        ZERO-COPY over the contiguous values buffer — no gather. Row
        selection (dups/shuffle/winner extraction) happens afterwards via
        ONE Arrow ``take`` in C++, which replaced a numpy repeat/arange
        ragged gather that moved ~5x the token bytes through RAM
        (73 s → ~8 s per 2M-event batch on a degraded box)."""
        n = len(lsn)
        total = int(offsets[-1])
        assert total < (1 << 31), (
            "token offsets exceed int32 — use more batches (keep "
            "events_per_batch * max_token_len < 2^31)")
        part_id = ((doc_idx * 2654435761 + 0x9E3779B9) % self.n_parts).astype(np.int32)
        tok = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()),
            pa.array(values, type=pa.int32()),
            mask=pa.array(is_delete),
        )
        # op/source as Arrow dictionary arrays: int8 codes instead of a
        # staged 2M-row unicode temp (parquet still stores logical strings;
        # take() gathers codes only)
        op_codes = np.where(is_delete, 2, np.where(first_pos, 0, 1)).astype(np.int8)
        op = pa.DictionaryArray.from_arrays(
            pa.array(op_codes), pa.array(["insert", "update", "delete"]))
        src_idx = (lsn % len(SOURCES)).astype(np.int8)  # deterministic, replayable
        source = pa.DictionaryArray.from_arrays(
            pa.array(src_idx, mask=is_delete), pa.array(list(SOURCES)))
        cols = {
            "lsn": pa.array(lsn),
            "epoch": pa.array((lsn // self.epoch_size).astype(np.int32)),
            "part_id": pa.array(part_id),
            "op": op,
            "doc_id": _doc_ids(doc_idx),
            "tokens": tok,
            "n_tok": pa.array(np.where(is_delete, None, lengths),
                              type=pa.int32(), from_pandas=True),
            "source": source,
        }
        if self.schema_change_batch is not None and b >= self.schema_change_batch:
            meta = np.where(is_delete, None,
                            np.char.add("m", (lsn % 97).astype("U3")))
            cols["meta"] = pa.array(meta, type=pa.string(), from_pandas=True)
        return pa.table(cols)

    # ------------------------------------------------------------ pass 1
    def write_batch(self, out_dir: str, b: int) -> str:
        """Generate batch ``b`` (must be called in order), update the
        winner state, write the batch directory, return its path."""
        assert b == self._next_batch, "pass-1 batches must be generated in order"
        self._next_batch += 1
        lo, lsn, doc_idx, first_pos, is_delete, lengths, rng = self._skeleton(b, self.seen)
        n = len(lsn)
        # winner bookkeeping: lsn is globally increasing, so the LAST
        # event of a doc in stream order wins — per batch, the max lsn
        np.maximum.at(self.win_lsn, doc_idx, lsn)
        # the winner's tombstone flag: recompute per doc touched this batch
        touched = np.unique(doc_idx)
        w = self.win_lsn[touched]
        # map winner lsns back to in-batch positions (winner of a touched
        # doc always lies in this batch: lsns only grow)
        pos = w - (lo + 1)
        self.win_deleted[touched] = is_delete[pos]

        dup_rng = self._rng(b, 1)
        sel = np.arange(n)
        n_dup = int(n * self.dup_rate)
        if n_dup:
            sel = np.concatenate([sel, dup_rng.choice(sel, n_dup)])
        dup_rng.shuffle(sel)
        offsets, values = self._tokens_for(b, np.where(is_delete, 0, lengths))
        natural = self._natural_table(b, lsn, doc_idx, first_pos, is_delete,
                                      lengths, offsets, values)
        # partition-sort the (dup'd, shuffled) selection STABLY so each
        # partition file keeps the shuffled delivery order, then do ONE
        # C++ take and write zero-copy slices per partition
        part_of_sel = (
            (doc_idx[sel] * 2654435761 + 0x9E3779B9) % self.n_parts
        ).astype(np.int32)
        order = np.argsort(part_of_sel, kind="stable")
        tbl = natural.take(pa.array(sel[order], type=pa.int64()))
        part_counts = np.bincount(part_of_sel, minlength=self.n_parts)
        path = os.path.join(out_dir, f"batch-{b:05d}")
        os.makedirs(path, exist_ok=True)
        # zero-copy partition slices of the one partition-sorted table,
        # written on a small thread pool (pyarrow releases the GIL in the
        # encoder; dictionary encoding is off — token values are uniform
        # random int32, the dictionary attempt only burns CPU)
        from concurrent.futures import ThreadPoolExecutor

        def _write_slice(p: int, off: int, c: int) -> None:
            pq.write_table(
                tbl.slice(off, c),
                os.path.join(path, f"part-{p:03d}.parquet"),
                compression=self.compression, row_group_size=65_536,
                use_dictionary=False, write_statistics=False)

        jobs = []
        off = 0
        for p in range(self.n_parts):
            c = int(part_counts[p])
            if c:
                jobs.append((p, off, c))
            off += c
        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(lambda j: _write_slice(*j), jobs))
        # cross-batch redelivery: replay a slice of the PREVIOUS batch's
        # already-written files as an extra stale-delivery fragment (the
        # at-least-once property; these lsns sit below the committed
        # watermark, so the engine must drop them idempotently)
        if b > 0 and self.cross_batch_dup_rate > 0:
            prev = os.path.join(out_dir, f"batch-{b - 1:05d}")
            if os.path.isdir(prev):  # pass-1 caller may already have GC'd it
                frags = sorted(f for f in os.listdir(prev)
                               if f.startswith("part-"))
                if frags:
                    pt = pq.read_table(os.path.join(prev, frags[0]))
                    n_re = min(pt.num_rows,
                               int(n * self.cross_batch_dup_rate))
                    if n_re:
                        cols = tbl.column_names
                        re_tbl = pt.slice(0, n_re)
                        if "meta" in cols and "meta" not in re_tbl.column_names:
                            re_tbl = re_tbl.append_column(
                                "meta", pa.nulls(n_re, pa.string()))
                        pq.write_table(
                            re_tbl.select(cols),
                            os.path.join(path, "redeliver-000.parquet"),
                            compression=self.compression,
                            row_group_size=65_536)
        base_t = 1_700_000_000 + b * 60
        for fn in os.listdir(path):
            os.utime(os.path.join(path, fn), (base_t, base_t))
        return path

    def write_manifest(self, out_dir: str) -> dict:
        manifest = {
            "generator": "streamed",
            "token_scheme": "fmix64",
            "n_events": self.n_events, "n_docs": self.n_docs,
            "n_parts": self.n_parts, "n_batches": self.n_batches,
            "seed": self.seed, "dup_rate": self.dup_rate,
            "cross_batch_dup_rate": self.cross_batch_dup_rate,
            "delete_rate": self.delete_rate,
            "hot_doc_count": self.hot_doc_count, "hot_frac": self.hot_frac,
            "token_len": list(self.token_len), "vocab": self.vocab,
            "schema_change_batch": self.schema_change_batch,
        }
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        return manifest

    # ------------------------------------------------------------ pass 2
    def write_expected(self, out_dir: str) -> int:
        """Ground truth: regenerate every batch's skeleton (identical —
        per-batch RNG stream 0) and keep exactly the rows whose lsn is
        the doc's winning lsn and whose op is not a delete. Written as
        plain parquet; compare to the engine table with an
        order-insensitive checksum. Returns expected row count."""
        assert self._next_batch == self.n_batches, "run pass 1 first"
        os.makedirs(out_dir, exist_ok=True)
        seen = np.zeros(self.n_docs, dtype=bool)
        total = 0
        for b in range(self.n_batches):
            lo, lsn, doc_idx, first_pos, is_delete, lengths, rng = self._skeleton(b, seen)
            offsets, values = self._tokens_for(b, np.where(is_delete, 0, lengths))
            winner = (self.win_lsn[doc_idx] == lsn) & ~is_delete
            sel = np.flatnonzero(winner)
            if not len(sel):
                continue
            natural = self._natural_table(b, lsn, doc_idx, first_pos,
                                          is_delete, lengths, offsets, values)
            tbl = natural.take(pa.array(sel, type=pa.int64()))
            keep = ["doc_id", "tokens", "n_tok", "source"]
            if "meta" in tbl.column_names:
                keep.append("meta")
            pq.write_table(tbl.select(keep),
                           os.path.join(out_dir, f"expected-{b:05d}.parquet"),
                           compression="zstd", row_group_size=65_536)
            total += len(sel)
        return total
