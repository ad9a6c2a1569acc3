"""Host-side passage store keyed by global row id.

Redesign of the reference's doc exchange: search_knn there pickles passage dicts into
uint8 CUDA tensors and ships them through NCCL gathers (/root/reference/src/index.py:33-40,
133-150). Here the device search returns int32 GLOBAL ids only; passage text never
touches the interconnect on the device path. Each host resolves the ids it owns and, in
multi-host runs, exchanges the small per-id payloads host-side via process_allgather
(the gloo-role side channel, SURVEY.md §5.8).
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Sequence

import numpy as np


class DocStore:
    """Maps global passage row ids -> passage dicts.

    Single-process: holds all passages. Multi-process: holds rows
    [row_offset, row_offset + len(passages)) of the global ordering.
    """

    def __init__(self, passages: Sequence[dict], row_offset: int = 0, n_total: int = -1):
        # keep the sequence as-is: NativePassageStore materializes dicts lazily,
        # and list() here would allocate 33M python dicts up front
        self.passages = passages if hasattr(passages, "__getitem__") else list(passages)
        self.row_offset = row_offset
        self.n_total = n_total if n_total >= 0 else len(self.passages)

    def __len__(self) -> int:
        return self.n_total

    @property
    def n_local(self) -> int:
        return len(self.passages)

    def owns(self, gid: int) -> bool:
        return self.row_offset <= gid < self.row_offset + len(self.passages)

    def lookup_local(self, gids: Sequence[int]) -> Dict[int, dict]:
        return {g: self.passages[g - self.row_offset] for g in gids if self.owns(g)}

    def lookup_batch(self, gids: np.ndarray) -> List[List[dict]]:
        """(B, k) global ids -> nested passage dicts; cross-host exchange if needed."""
        import jax

        flat = [int(g) for g in np.asarray(gids).reshape(-1)]
        if jax.process_count() == 1:
            table = {g: self.passages[g] for g in set(flat)}
        else:
            table = self._exchange(set(flat))
        out, k = [], gids.shape[-1]
        for row in np.asarray(gids).reshape(-1, k):
            out.append([table[int(g)] for g in row])
        return out

    def _exchange(self, needed: set) -> Dict[int, dict]:
        """All-to-all host-side doc exchange over the process side channel."""
        from jax.experimental import multihost_utils

        # Round 1: union the needed-id sets. A process only knows its OWN result
        # ids; the ids it must SERVE belong to other processes' queries (a rank
        # with zero queries still owns docs that everyone else needs).
        ids = np.fromiter(sorted(needed), dtype=np.int64, count=len(needed))
        id_sizes = multihost_utils.process_allgather(np.array([ids.size], dtype=np.int64))
        m = max(int(id_sizes.max()), 1)
        padded_ids = np.full((m,), -1, dtype=np.int64)
        padded_ids[: ids.size] = ids
        all_ids = multihost_utils.process_allgather(padded_ids)  # (P, m)
        union = {int(g) for g in all_ids.reshape(-1) if g >= 0}

        # Round 2: each process serves the union rows it owns.
        local = self.lookup_local(sorted(union))
        payload = pickle.dumps(local, protocol=pickle.HIGHEST_PROTOCOL)
        buf = np.frombuffer(payload, dtype=np.uint8)
        # pad to a common max length, exchange sizes first
        import jax

        sizes = multihost_utils.process_allgather(np.array([buf.size], dtype=np.int64))
        max_size = int(sizes.max())
        padded = np.zeros((max_size,), dtype=np.uint8)
        padded[: buf.size] = buf
        gathered = multihost_utils.process_allgather(padded)  # (P, max_size)
        table: Dict[int, dict] = {}
        for p in range(jax.process_count()):
            table.update(pickle.loads(gathered[p, : int(sizes[p, 0])].tobytes()))
        return table
