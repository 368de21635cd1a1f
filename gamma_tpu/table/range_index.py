"""Hybrid-search filter index.

Reference: table/field_range_index.{h,cc} (MultiFieldsRangeIndex) — a
concurrent B-tree per indexed field mapping values → adaptive
sparse/dense posting bitmaps, with async writes and bitmap AND/OR/NOT
composition (Search:1015-1115, Intersect:1117-1200).

TPU-native re-derivation: there is no B-tree.  Numeric predicates are
evaluated directly over device-mirrored columns inside the search step
(a [N] compare is a trivially-vectorized VPU pass, far cheaper than tree
walks at TPU bandwidth), producing the fused penalty array.  Term (string)
filters keep a host inverted map term→docid list; term predicates compose
into a boolean mask uploaded only when present.

The write path stays off the query critical path like the reference's
async field-index worker (field_range_index.cc:901-989): device column
mirrors are refreshed by the engine's flush step, not per-doc.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gamma_tpu.api.request import RangeFilter, TermFilter
from gamma_tpu.config import DataType
from gamma_tpu.ops import penalty as pen_ops
from gamma_tpu.table.table import Table


class MultiFieldsRangeIndex:
    def __init__(self, table: Table):
        self.table = table
        self._lock = threading.Lock()
        self.numeric_fields: List[str] = []
        self.term_fields: List[str] = []
        # device mirrors of numeric columns, refreshed on flush
        self._device_cols: Dict[str, jnp.ndarray] = {}
        self._device_rows = 0
        # term postings: field → term → list[docid]
        self._postings: Dict[str, Dict[str, List[int]]] = {}

    # ---- schema (reference: AddField, field_range_index.cc:1202-1217) ----

    def add_field(self, name: str, data_type: DataType) -> None:
        with self._lock:
            if data_type == DataType.STRING:
                self.term_fields.append(name)
                self._postings[name] = {}
            else:
                self.numeric_fields.append(name)

    # ---- writes ----

    def add_doc(self, docid: int, fields: Dict) -> None:
        """Index term fields for one doc.  Numeric fields need no per-doc
        work — the column itself is the index."""
        for name in self.term_fields:
            v = fields.get(name)
            if v is None:
                continue
            for term in str(v).split("\x01"):
                if term:
                    self._postings[name].setdefault(term, []).append(docid)

    def delete_doc(self, docid: int) -> None:
        # deletes are handled by the global validity penalty; postings may
        # keep stale docids harmlessly (they're masked by validity).
        pass

    def rebuild(self, table: Table) -> None:
        """Bulk-rebuild term postings from the table after a restore —
        one pass over each string heap instead of a get_doc dict per doc
        (reference re-adds docs one at a time, gamma_engine.cc:1251-1256;
        this is the vectorized equivalent).  Numeric fields need nothing:
        the column itself is the index."""
        n = table.n
        with self._lock:
            for name in self.term_fields:
                postings: Dict[str, List[int]] = {}
                heap = table.heaps[name]
                get = heap.get
                for docid in range(n):
                    v = get(docid)
                    if not v:
                        continue
                    if "\x01" in v:
                        for term in v.split("\x01"):
                            if term:
                                postings.setdefault(term, []).append(docid)
                    else:
                        postings.setdefault(v, []).append(docid)
                self._postings[name] = postings

    def flush_device(self, pad_chunk: int = 4096,
                     dirty: Optional[List[int]] = None) -> None:
        """Refresh device mirrors of numeric columns (engine calls this on
        its ingest flush; queries between flushes see the last mirror,
        same freshness model as the reference's async index worker).
        Incremental: only rows beyond the previous mirror plus rows dirtied
        by updates travel over the host link.  `dirty` is the batch of
        updated docids (the engine takes table.take_dirty() once and
        shares it with the persistence flush)."""
        n = self.table.n
        rows = -(-max(n, 1) // pad_chunk) * pad_chunk
        if dirty is None:
            dirty = self.table.take_dirty()
        if rows != self._device_rows or not self._device_cols:
            for name in self.numeric_fields:
                col = np.zeros(rows, dtype=np.float32)
                col[:n] = self.table.column(name).astype(np.float32)
                self._device_cols[name] = jnp.asarray(col)
            self._device_rows = rows
            self._mirrored = n
            return
        start = getattr(self, "_mirrored", 0)
        if n > start:
            pad = -(-(n - start) // 1024) * 1024
            idx = np.arange(start, start + pad, dtype=np.int64)
            # padded tail must be DROPPED, not clamped (clamping writes a
            # zero over the last real row); scatter mode="drop" discards
            # positive out-of-bounds indices
            idx[n - start:] = 0x40000000
            for name in self.numeric_fields:
                vals = np.zeros(pad, np.float32)
                vals[: n - start] = self.table.column(name)[
                    start:n].astype(np.float32)
                self._device_cols[name] = self._device_cols[name].at[
                    jnp.asarray(idx)].set(jnp.asarray(vals),
                                          mode="drop")
            self._mirrored = n
        if dirty:
            didx = np.asarray([d for d in dirty if d < n], np.int64)
            if didx.size:
                for name in self.numeric_fields:
                    vals = self.table.column(name)[didx].astype(np.float32)
                    self._device_cols[name] = self._device_cols[name].at[
                        jnp.asarray(didx)].set(jnp.asarray(vals))

    # ---- query (reference: Search/Intersect :1015-1200) ----

    def term_mask(self, term_filters: Sequence[TermFilter],
                  n: int) -> Optional[np.ndarray]:
        """Boolean mask over [0, n) from term filters (AND across filters;
        union/intersection across terms within one filter per is_union)."""
        if not term_filters:
            return None
        mask = np.ones(n, dtype=bool)
        for tf in term_filters:
            postings = self._postings.get(tf.field, {})
            terms = tf.terms()
            # is_union: 1 = OR across terms, 0 = AND, 2 = NOT (exclude
            # docs matching any term) — FilterOperator
            # field_range_index.h:23
            if tf.is_union == 0:
                m = np.ones(n, dtype=bool)
                for t in terms:
                    mt = np.zeros(n, dtype=bool)
                    ids = postings.get(t)
                    if ids:
                        arr = np.asarray(ids)
                        mt[arr[arr < n]] = True
                    m &= mt
            else:
                m = np.zeros(n, dtype=bool)
                for t in terms:
                    ids = postings.get(t)
                    if ids:
                        arr = np.asarray(ids)
                        m[arr[arr < n]] = True
                if tf.is_union == 2:
                    m = ~m
            mask &= m
        return mask

    def range_penalties(self, range_filters: Sequence[RangeFilter]
                        ) -> List[jnp.ndarray]:
        """Per-filter penalty arrays over the device column mirrors."""
        out = []
        for rf in range_filters:
            col = self._device_cols.get(rf.field)
            if col is None:
                # field not mirrored yet (no flush): fail CLOSED — a
                # filter that cannot be evaluated must not admit docs
                out.append(jnp.full((max(self._device_rows, 1),),
                                    np.float32(3.0e38)))
                continue
            out.append(pen_ops.range_penalty(
                col, rf.lower_value, rf.upper_value,
                include_lower=rf.include_lower,
                include_upper=rf.include_upper))
        return out

    @property
    def device_rows(self) -> int:
        return self._device_rows

    def mem_bytes(self) -> int:
        m = sum(c.size * 4 for c in self._device_cols.values())
        for field, post in self._postings.items():
            for t, ids in post.items():
                m += len(ids) * 8 + len(t)
        return int(m)
