"""Metadata prefilter compilation.

The reference evaluates `where` filters with Python loops over candidate
documents at query time (picovdb/pico_vdb.py:613-656). Here dict-shaped
filters compile to vectorized NumPy mask operations over a lazily built
columnar *tag index*: per metadata key, an int64 column of `hash(value)` per
slot. Equality / `$in` filters then become one vectorized compare, with an
exact-equality verification pass over hash matches only (collision safety).
Arbitrary callables keep the reference's Python-loop semantics.

Dict filters are a strict superset of the reference: multi-key dicts mean AND
(the reference only fast-paths single-key dicts and crashes on multi-key
dicts by calling them, pico_vdb.py:643-645).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Union

import numpy as np

WhereType = Union[Dict[str, Any], Callable[[dict], bool]]

# Sentinel hash for "key absent or doc deleted". Collisions with a real
# hash(value) are resolved by the verification pass.
_MISSING = np.int64(-0x6A09E667F3BCC909)


def _safe_hash(v: Any) -> int:
    try:
        return hash(v)
    except TypeError:
        # Unhashable values (lists, dicts) can never match a hashed probe;
        # they fall through to the verification pass via the missing bucket.
        return int(_MISSING)


class TagIndex:
    """Lazily built per-key hash columns over the slot table.

    Columns are built on first filter use of a key (O(N) once) and then kept
    incrementally up to date by `update_rows` / `clear_rows` / `resize`.
    """

    def __init__(self) -> None:
        self._cols: Dict[str, np.ndarray] = {}
        self._size = 0

    def reset(self) -> None:
        self._cols.clear()

    def resize(self, new_size: int) -> None:
        if new_size < self._size:
            self._cols.clear()
        else:
            grow = new_size - self._size
            if grow and self._cols:
                pad = np.full(grow, _MISSING, dtype=np.int64)
                for k in list(self._cols):
                    self._cols[k] = np.concatenate([self._cols[k], pad])
        self._size = new_size

    def update_rows(self, idxs: List[int], docs: List[Optional[dict]]) -> None:
        """Refresh columns for mutated slots. `docs[i]` is the new doc of `idxs[i]`."""
        if not self._cols:
            return
        for key, col in self._cols.items():
            for i, doc in zip(idxs, docs):
                if doc is None or key not in doc:
                    col[i] = _MISSING
                else:
                    col[i] = _safe_hash(doc[key])

    def clear_rows(self, idxs: List[int]) -> None:
        for col in self._cols.values():
            col[idxs] = _MISSING

    def _column(self, key: str, docs: List[Optional[dict]]) -> np.ndarray:
        col = self._cols.get(key)
        if col is None or col.shape[0] != self._size:
            col = np.full(self._size, _MISSING, dtype=np.int64)
            for i, doc in enumerate(docs):
                if doc is not None and key in doc:
                    col[i] = _safe_hash(doc[key])
            self._cols[key] = col
        return col

    def eq_mask(
        self, key: str, value: Any, docs: List[Optional[dict]]
    ) -> np.ndarray:
        """Boolean mask over slots where doc[key] == value."""
        col = self._column(key, docs)
        probe = _safe_hash(value)
        mask = col == np.int64(probe)
        # Verify equality on hash hits only (collision + unhashable safety).
        hits = np.nonzero(mask)[0]
        for i in hits:
            doc = docs[i]
            if doc is None or doc.get(key) != value:
                mask[i] = False
        if probe == int(_MISSING):
            # probe collided with the missing sentinel: scan properly.
            for i in range(self._size):
                doc = docs[i]
                if doc is not None and key in doc and doc.get(key) == value:
                    mask[i] = True
        return mask

    def in_mask(
        self, key: str, values: Any, docs: List[Optional[dict]]
    ) -> np.ndarray:
        col = self._column(key, docs)
        vals = list(values)
        probes = np.asarray([_safe_hash(v) for v in vals], dtype=np.int64)
        mask = np.isin(col, probes)
        value_set = set()
        unhashable = []
        for v in vals:
            try:
                value_set.add(v)
            except TypeError:
                unhashable.append(v)
        hits = np.nonzero(mask)[0]
        for i in hits:
            doc = docs[i]
            ok = False
            if doc is not None and key in doc:
                dv = doc.get(key)
                try:
                    ok = dv in value_set
                except TypeError:
                    ok = False
                if not ok and unhashable:
                    ok = any(dv == u for u in unhashable)
            if not ok:
                mask[i] = False
        return mask


def compile_where_mask(
    where: WhereType,
    docs: List[Optional[dict]],
    active_mask: np.ndarray,
    tag_index: Optional[TagIndex],
) -> np.ndarray:
    """Compile a `where` filter to a boolean slot mask (restricted to actives).

    Dict filters use the tag index (vectorized); callables run the reference's
    Python loop over active slots (picovdb/pico_vdb.py:643-648).
    """
    n = active_mask.shape[0]
    if isinstance(where, dict):
        mask = active_mask.copy()
        for k, v in where.items():
            if isinstance(v, dict) and set(v.keys()) == {"$in"}:
                if tag_index is not None:
                    mask &= tag_index.in_mask(k, v["$in"], docs)
                else:
                    values = list(v["$in"])
                    sub = np.zeros(n, dtype=bool)
                    for i in np.nonzero(mask)[0]:
                        doc = docs[i]
                        if doc is not None and _value_in(doc.get(k), values):
                            sub[i] = True
                    mask &= sub
            else:
                if tag_index is not None:
                    mask &= tag_index.eq_mask(k, v, docs)
                else:
                    sub = np.zeros(n, dtype=bool)
                    for i in np.nonzero(mask)[0]:
                        doc = docs[i]
                        if doc is not None and doc.get(k) == v:
                            sub[i] = True
                    mask &= sub
        return mask
    if callable(where):
        mask = np.zeros(n, dtype=bool)
        for i in np.nonzero(active_mask)[0]:
            doc = docs[i]
            if doc is not None and where(doc):
                mask[i] = True
        return mask
    raise TypeError(f"where must be a dict or callable; got {type(where)!r}")


def _value_in(value: Any, values: List[Any]) -> bool:
    try:
        return value in values
    except TypeError:
        return any(value == v for v in values)
