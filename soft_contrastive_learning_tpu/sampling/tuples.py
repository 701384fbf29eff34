"""Host-side tuple sampler: anchors -> (positives, negatives[, other]) with
geometric distance payloads.

Capability parity with reference ``get_tuple`` (train/train.py:433-582):

* positives: within ``max_pos_radius`` of the anchor AND yaw within pi/6
  (reference :456-458), topped up with hard positives = cache members that
  are valid positives but FARTHEST in embedding space (reference :461-470),
* negatives: outside ``min_neg_radius``; hard negatives = cache members
  NEAREST in embedding space that aren't excluded (reference :472-500), with
  optional mutual exclusion of negative neighborhoods,
* quadruplets additionally sample an 'other negative' outside the
  neighborhoods of the anchor and every chosen negative (reference :505-520),
* per-loss geometric payloads (``distance_type``) exactly as built at
  reference :525-571.

Differences, by design (SURVEY.md §7 'what not to replicate'):
* static output shapes — faulty anchors are RESAMPLED from the remaining pool
  instead of dropping the whole batch (the reference drops batches,
  :490-491,574-576, which XLA's static shapes can't absorb),
* the reference's stale-variable bug at :497 (``excluded.add(ti)`` instead of
  ``next_i``) is fixed,
* ``used_indices`` accumulates over ALL tuples (the reference returns only the
  last tuple's, :578-582),
* all randomness flows through an explicit ``numpy.random.Generator`` so runs
  are reproducible and checkpointable.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np
from sklearn.neighbors import KDTree

from soft_contrastive_learning_tpu.core.config import LossConfig, TupleConfig
from soft_contrastive_learning_tpu.sampling.mining import MiningCache


@dataclass
class TupleSample:
    """One sampled batch: (T, S) dataset indices + loss payloads."""

    indices: np.ndarray  # (T, S) int
    payload: Dict[str, np.ndarray] = field(default_factory=dict)
    used_indices: Set[int] = field(default_factory=set)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x, dtype=np.float64)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


class TupleSampler:
    def __init__(
        self,
        tuples: TupleConfig,
        loss: LossConfig,
        tuple_shape: Tuple[int, ...],
        xy: np.ndarray,  # (M, 2) easting/northing
        yaw: np.ndarray,  # (M,)
        rng: Optional[np.random.Generator] = None,
    ):
        self.tuples = tuples
        self.loss = loss
        self.tuple_shape = tuple_shape
        self.xy = np.asarray(xy, dtype=float)
        self.yaw = np.asarray(yaw, dtype=float)
        self.rng = rng if rng is not None else np.random.default_rng(42)
        self.ref_tree = KDTree(self.xy)
        self._p = tuple_shape[1]
        self._n = tuple_shape[2]
        self._quadruplet = len(tuple_shape) == 4

    # ------------------------------------------------------------ single tuple
    def _potential_positives(self, index: int) -> np.ndarray:
        near = self.ref_tree.query_radius(
            self.xy[index : index + 1], r=self.tuples.max_pos_radius
        )[0]
        near = near[near != index]
        # Circular yaw difference. The reference's |a-b| % 2pi form
        # (train/train.py:458) is NOT circular: headings straddling the
        # 0/2pi seam (e.g. 0.05 vs 6.23, truly ~0.1 rad apart) evaluate to
        # ~6.18 and get rejected, silently dropping co-heading positives for
        # every anchor near the seam — fixed like the other latent reference
        # bugs (PARITY.md).
        yaw_d = np.abs(self.yaw[index] - self.yaw[near]) % (2 * math.pi)
        yaw_ok = np.minimum(yaw_d, 2 * math.pi - yaw_d) < self.tuples.max_yaw_diff
        return near[yaw_ok]

    def _neighborhood(self, index: int) -> np.ndarray:
        return self.ref_tree.query_radius(
            self.xy[index : index + 1], r=self.tuples.min_neg_radius
        )[0]

    def _sample_one(
        self, index: int, use_hard: bool, cache: Optional[MiningCache]
    ) -> Optional[np.ndarray]:
        t = self.tuples
        sorted_cache: Optional[np.ndarray] = None
        if use_hard and cache is not None and cache.ready:
            sorted_cache = cache.sorted_neighbors(index)

        potential_pos = self._potential_positives(index)
        if len(potential_pos) == 0:
            return None

        hard_pos: List[int] = []
        if sorted_cache is not None and t.hard_positives_per_tuple > 0:
            pos_set = set(potential_pos.tolist())
            for ci in reversed(sorted_cache):  # farthest-in-embedding first
                # dedup: the mining window can contain the same dataset index
                # twice (rolling window wrap / upcoming anchors inside it)
                if int(ci) in pos_set and int(ci) not in hard_pos:
                    hard_pos.append(int(ci))
                    if len(hard_pos) >= t.hard_positives_per_tuple:
                        break
        n_rand_pos = self._p - len(hard_pos)
        positives = self.rng.choice(potential_pos, n_rand_pos).tolist() + hard_pos

        excluded: Set[int] = set(self._neighborhood(index).tolist())
        hard_neg: List[int] = []
        if sorted_cache is not None and t.hard_negatives_per_tuple > 0:
            for ci in sorted_cache:  # nearest-in-embedding first
                ci = int(ci)
                if ci not in excluded:
                    hard_neg.append(ci)
                    if t.mutually_exclusive_negs:
                        excluded.update(self._neighborhood(ci).tolist())
                    else:
                        excluded.add(ci)
                    if len(hard_neg) >= t.hard_negatives_per_tuple:
                        break

        num_total = len(self.yaw)
        rand_negs: List[int] = []
        n_rand_negs = self._n - len(hard_neg)
        while len(rand_negs) < n_rand_negs:
            if len(excluded) >= num_total:
                return None
            # Rejection-sample first: excluded is tiny relative to the epoch
            # set, so a draw almost always lands outside it — O(1) expected
            # vs rebuilding an O(M log M) setdiff per negative.
            next_i = -1
            for _ in range(32):
                cand = int(self.rng.integers(num_total))
                if cand not in excluded:
                    next_i = cand
                    break
            if next_i < 0:  # dense exclusion: fall back to the exact set
                remaining = np.setdiff1d(
                    np.arange(num_total),
                    np.fromiter(excluded, dtype=int, count=len(excluded)),
                )
                if len(remaining) == 0:
                    return None
                next_i = int(self.rng.choice(remaining))
            rand_negs.append(next_i)
            if t.mutually_exclusive_negs:
                excluded.update(self._neighborhood(next_i).tolist())
            else:
                excluded.add(next_i)  # reference bug (stale ti, :497) fixed
        negatives = rand_negs + hard_neg

        members = [index] + list(positives) + list(negatives)
        if self._quadruplet:
            if not t.mutually_exclusive_negs:
                # Reference-faithful over-exclusion: the reference expands
                # the neighborhoods of EVERYTHING in `excluded` (its
                # `original_negatives = excluded.copy()`, train/train.py:
                # 509-513), which includes the anchor's whole min_neg_radius
                # neighborhood — a 2-hop exclusion, not just the negatives'.
                # Kept as-is for behavioral parity of the quadruplet payload.
                for neg in list(excluded):
                    excluded.update(self._neighborhood(int(neg)).tolist())
            remaining = np.setdiff1d(
                np.arange(num_total), np.fromiter(excluded, dtype=int, count=len(excluded))
            )
            if len(remaining) == 0:
                return None
            members.append(int(self.rng.choice(remaining)))
        out = np.asarray(members, dtype=int)
        if len(out) != sum(self.tuple_shape):
            return None
        return out

    # ------------------------------------------------------------ payloads
    def _payload_one(self, tuple_indices: np.ndarray) -> Dict[str, np.ndarray]:
        """Per-tuple geometric payload (reference train/train.py:525-571)."""
        dt = self.loss.distance_type
        if dt == "none":
            return {}
        p = self._p
        n = self._n
        anchor = tuple_indices[0]
        positives = tuple_indices[1 : 1 + p]
        negatives = tuple_indices[1 + p : 1 + p + n]
        a_xy = self.xy[anchor]
        pos_xy = self.xy[positives]
        neg_xy = self.xy[negatives]
        alpha, beta = self.loss.alpha, self.loss.beta

        if dt == "anchor":
            return {"sq_pos_geo_dists": np.sum((pos_xy - a_xy) ** 2, axis=1)}
        if dt == "pairwise":
            pts = np.concatenate([a_xy[None], pos_xy], axis=0)
            diff = pts[:, None, :] - pts[None, :, :]
            return {"pairwise_sq_geo_dists": np.sum(diff**2, axis=-1)}
        if dt == "swrd":
            pos_d = np.linalg.norm(pos_xy - a_xy, axis=1)
            neg_d = np.linalg.norm(neg_xy - a_xy, axis=1)
            return {
                "pos_weights": _sigmoid(-alpha * (pos_d - beta))[:, None],
                "neg_weights": _sigmoid(-alpha * (beta - neg_d))[:, None],
            }
        if dt == "wrd":  # also prodwrd / sumwrd
            all_d = np.concatenate(
                [
                    np.linalg.norm(pos_xy - a_xy, axis=1),
                    np.linalg.norm(neg_xy - a_xy, axis=1),
                ]
            )
            return {
                "pos_weights": _sigmoid(-alpha * (all_d - beta))[:, None],
                "neg_weights": _sigmoid(-alpha * (beta - all_d))[:, None],
            }
        if dt == "logratio":
            return {
                "sq_pos_geo_dists": np.sum((pos_xy - a_xy) ** 2, axis=1),
                "sq_neg_geo_dists": np.sum((neg_xy - a_xy) ** 2, axis=1),
            }
        if dt == "wms":
            return {}  # built batch-globally in sample()
        raise ValueError(f"unknown distance_type {dt!r}")

    # ------------------------------------------------------------ batch
    def sample(
        self,
        anchor_indices: Sequence[int],
        use_hard: bool = False,
        cache: Optional[MiningCache] = None,
        anchor_pool: Optional[np.ndarray] = None,
        max_retries: int = 32,
    ) -> Optional[TupleSample]:
        """Sample one batch of T tuples. Failed anchors are resampled from
        ``anchor_pool`` (defaults to the whole dataset) to keep shapes static."""
        if anchor_pool is None:
            anchor_pool = np.arange(len(self.yaw))
        tuples_out: List[np.ndarray] = []
        used: Set[int] = set()
        for anchor in anchor_indices:
            member = self._sample_one(int(anchor), use_hard, cache)
            retries = 0
            while member is None and retries < max_retries:
                member = self._sample_one(
                    int(self.rng.choice(anchor_pool)), use_hard, cache
                )
                retries += 1
            if member is None:
                return None  # pathological dataset; caller may skip
            tuples_out.append(member)
            used.update(member.tolist())

        indices = np.stack(tuples_out)  # (T, S)
        payload: Dict[str, List[np.ndarray]] = {}
        for row in indices:
            for k, v in self._payload_one(row).items():
                payload.setdefault(k, []).append(v)
        stacked = {
            k: np.stack(v).astype(np.float32) for k, v in payload.items()
        }
        if self.loss.distance_type == "wms":
            # Full-batch geographic distance matrix over every tuple member
            # (the intended wms semantics; see losses/registry.py docstring).
            flat = indices.reshape(-1)
            pts = self.xy[flat]
            diff = pts[:, None, :] - pts[None, :, :]
            stacked["geo_dist_matrix"] = np.sqrt(
                np.maximum(np.sum(diff**2, axis=-1), 0.0)
            ).astype(np.float32)
        return TupleSample(indices=indices, payload=stacked, used_indices=used)
