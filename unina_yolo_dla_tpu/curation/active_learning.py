"""Active learning: uncertainty scoring + coreset selection.

Parity with ``/root/reference/unina_yolo_dla/active_learning.py``:

- entropy mode: max per-pixel-per-class BINARY sigmoid entropy over all
  pyramid levels (active_learning.py:289-294).
- loc_var mode: max of ``1 - 2*|max_class_conf - 0.5|`` (":296-301).
- embeddings: global-average-pool of the backbone's P4+SPPF feature map
  (":31-99" — we apply the Backbone submodule directly instead of the
  reference's three model-introspection fallbacks).
- K-Center Greedy and MiniBatchKMeans coreset selection (":104-211"),
  with embedding caching (":327-359").

TPU-first: scoring is a single jitted batched computation per batch —
no per-image host loops; only the final (B,) score vector leaves the
device.
"""
from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


def binary_entropy_map(probs: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Elementwise binary entropy of sigmoid probabilities."""
    return -(probs * jnp.log(probs + eps)
             + (1.0 - probs) * jnp.log(1.0 - probs + eps))


def entropy_scores(outputs) -> jnp.ndarray:
    """Per-image difficulty: max binary entropy over levels x classes x HW."""
    per_level = []
    for cls_l, _reg in outputs:
        probs = jax.nn.sigmoid(cls_l.astype(jnp.float32))
        ent = binary_entropy_map(probs)
        per_level.append(jnp.max(ent.reshape(ent.shape[0], -1), axis=1))
    return jnp.max(jnp.stack(per_level), axis=0)


def loc_var_scores(outputs) -> jnp.ndarray:
    """Per-image difficulty: max closeness-to-0.5 of the top class conf."""
    per_level = []
    for cls_l, _reg in outputs:
        probs = jax.nn.sigmoid(cls_l.astype(jnp.float32))
        conf = jnp.max(probs, axis=-1)               # (B, H, W)
        unc = 1.0 - jnp.abs(conf - 0.5) * 2.0
        per_level.append(jnp.max(unc.reshape(unc.shape[0], -1), axis=1))
    return jnp.max(jnp.stack(per_level), axis=0)


def kcenter_greedy(embeddings: np.ndarray, k: int,
                   seed: int = 0) -> list[int]:
    """K-Center Greedy: iteratively add the point farthest from the
    selected set (active_learning.py:104-163)."""
    n = len(embeddings)
    k = min(k, n)
    rng = np.random.default_rng(seed)
    emb = np.asarray(embeddings, np.float64)
    selected = [int(rng.integers(n))]
    dists = np.linalg.norm(emb - emb[selected[0]], axis=1)
    for _ in range(k - 1):
        nxt = int(np.argmax(dists))
        selected.append(nxt)
        dists = np.minimum(dists, np.linalg.norm(emb - emb[nxt], axis=1))
    return selected


def kmeans_select(embeddings: np.ndarray, k: int, seed: int = 0) -> list[int]:
    """MiniBatchKMeans: the sample nearest each centroid
    (active_learning.py:166-211)."""
    from sklearn.cluster import MiniBatchKMeans

    n = len(embeddings)
    k = min(k, n)
    km = MiniBatchKMeans(n_clusters=k, random_state=seed, n_init=3)
    km.fit(embeddings)
    selected = []
    for c in km.cluster_centers_:
        idx = int(np.argmin(np.linalg.norm(embeddings - c, axis=1)))
        if idx not in selected:
            selected.append(idx)
    # fill duplicates-removed slots with farthest remaining points
    i = 0
    while len(selected) < k and i < n:
        if i not in selected:
            selected.append(i)
        i += 1
    return selected[:k]


class ActiveLearner:
    """Uncertainty + diversity driven sample selection over a JAX model."""

    def __init__(self, model, variables) -> None:
        self.model = model
        self.variables = {
            k: variables[k] for k in ("params", "batch_stats", "quant")
            if k in variables
        }
        self._cached_embeddings: np.ndarray | None = None
        self._cached_paths: list[str] | None = None

        def fwd(v, x):
            return self.model.apply(v, x, train=False)

        self._fwd = jax.jit(fwd)

        from ..models.backbone import Backbone

        bb = Backbone(self.model.config)

        def embed(v, x):
            sub = {"params": v["params"]["backbone"],
                   "batch_stats": v["batch_stats"]["backbone"]}
            if "quant" in v and "backbone" in v.get("quant", {}):
                sub["quant"] = v["quant"]["backbone"]
            _p2, _p3, _p4, p4_sppf = bb.apply(sub, x, False)
            return jnp.mean(p4_sppf.astype(jnp.float32), axis=(1, 2))

        self._embed = jax.jit(embed)

    def compute_difficulty_scores(
        self,
        batches: Iterable[tuple[np.ndarray, list[str]]],
        mode: str = "entropy",
    ) -> dict[str, float]:
        """``batches`` yields (images (B,H,W,3) normalised float32, paths).

        Returns {path: score} — the ``difficulty_map.json`` payload consumed
        by difficulty-weighted sampling (data.load_difficulty_weights).
        """
        score_fn: Callable = (entropy_scores if mode == "entropy"
                              else loc_var_scores)
        scores: dict[str, float] = {}
        for images, paths in batches:
            outputs = self._fwd(self.variables, jnp.asarray(images))
            s = np.asarray(score_fn(outputs))
            for p, v in zip(paths, s):
                scores[p] = float(v)
        return scores

    def query_uncertain_samples(
        self,
        batches: Iterable[tuple[np.ndarray, list[str]]],
        top_k: int = 100,
        mode: str = "entropy",
    ) -> list[str]:
        scores = self.compute_difficulty_scores(batches, mode)
        return sorted(scores, key=scores.get, reverse=True)[:top_k]

    def extract_embeddings(
        self, batches: Iterable[tuple[np.ndarray, list[str]]]
    ) -> tuple[np.ndarray, list[str]]:
        embs, paths = [], []
        for images, batch_paths in batches:
            embs.append(np.asarray(
                self._embed(self.variables, jnp.asarray(images))))
            paths.extend(batch_paths)
        return np.concatenate(embs), paths

    def coreset_selection(
        self,
        batches_fn: Callable[[], Iterable[tuple[np.ndarray, list[str]]]],
        target_size: int,
        method: str = "kcenter",
    ) -> list[str]:
        if self._cached_embeddings is None:
            self._cached_embeddings, self._cached_paths = (
                self.extract_embeddings(batches_fn()))
        select = kmeans_select if method == "kmeans" else kcenter_greedy
        idx = select(self._cached_embeddings, target_size)
        return [self._cached_paths[i] for i in idx]

    def invalidate_cache(self) -> None:
        self._cached_embeddings = None
        self._cached_paths = None
