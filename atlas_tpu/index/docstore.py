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

    # epoch counter for the per-destination key namespace; _exchange is a
    # collective (every process enters it together), so counters stay aligned
    _exchange_epoch = 0

    def _exchange(self, needed: set) -> Dict[int, dict]:
        """Per-destination host-side doc exchange (reference semantics:
        varsize_gather(dst=k), /root/reference/src/index.py:138-141 — each rank
        receives ONLY the docs its own queries asked for).

        Round 1 all-gathers the requested id-sets (8 bytes/id — the servers must
        learn what is asked of them; a rank with zero queries still owns docs
        everyone else needs). Round 2 routes each (server -> destination) doc
        payload through the jax.distributed key-value store, so received bytes
        per process scale with its own topk*B instead of O(P x union) as a
        union-broadcast would."""
        import jax
        from jax.experimental import multihost_utils

        ids = np.fromiter(sorted(needed), dtype=np.int64, count=len(needed))
        id_sizes = multihost_utils.process_allgather(np.array([ids.size], dtype=np.int64))
        m = max(int(id_sizes.max()), 1)
        padded_ids = np.full((m,), -1, dtype=np.int64)
        padded_ids[: ids.size] = ids
        all_ids = multihost_utils.process_allgather(padded_ids)  # (P, m)

        client = getattr(getattr(jax, "_src", None) and __import__(
            "jax._src.distributed", fromlist=["global_state"]).global_state, "client", None)
        P = jax.process_count()
        me = jax.process_index()
        if client is None:  # no coordinator KV store: union broadcast fallback
            union = {int(g) for g in all_ids.reshape(-1) if g >= 0}
            local = self.lookup_local(sorted(union))
            payload = pickle.dumps(local, protocol=pickle.HIGHEST_PROTOCOL)
            buf = np.frombuffer(payload, dtype=np.uint8)
            sizes = multihost_utils.process_allgather(np.array([buf.size], dtype=np.int64))
            padded = np.zeros((int(sizes.max()),), dtype=np.uint8)
            padded[: buf.size] = buf
            gathered = multihost_utils.process_allgather(padded)
            table: Dict[int, dict] = {}
            for p in range(P):
                table.update(pickle.loads(gathered[p, : int(sizes[p, 0])].tobytes()))
            return table

        epoch = DocStore._exchange_epoch
        DocStore._exchange_epoch += 1
        # serve: one pickle per destination, holding only ITS requested rows we own
        for d in range(P):
            if d == me:
                continue
            want_d = [int(g) for g in all_ids[d, : int(id_sizes[d, 0])]]
            payload = pickle.dumps(self.lookup_local(want_d),
                                   protocol=pickle.HIGHEST_PROTOCOL)
            client.key_value_set_bytes(f"atlas_docx/{epoch}/{me}/{d}", payload)
        # receive: my docs from every other server; delete consumed keys (each
        # key has exactly one reader, so no barrier is needed before delete)
        table = self.lookup_local([int(g) for g in ids])
        for s in range(P):
            if s == me:
                continue
            key = f"atlas_docx/{epoch}/{s}/{me}"
            got = client.blocking_key_value_get_bytes(key, 600_000)
            table.update(pickle.loads(got))
            client.key_value_delete(key)
        return table
