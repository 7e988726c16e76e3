"""Dataset explorer: embedding-based similarity search over a dataset.

Parity surface: reference ultralytics/data/explorer/ (LanceDB-backed
Explorer with similarity queries). LanceDB isn't in this environment, so
embeddings live in a numpy table (.npz) — same user surface:
build a table once, then query similar images by index or image.

Embeddings are the global-average-pooled P5 feature map of the detection
backbone (the head's last input level), L2-normalized.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from yolo_ad_refine_tpu.data.dataset import YOLODataset
from yolo_ad_refine_tpu.utils import LOGGER


class Explorer:
    def __init__(self, data: str | dict | None = None, img_path: str | None = None,
                 model=None, imgsz: int = 256, batch: int = 16):
        from yolo_ad_refine_tpu.data.dataset import check_det_dataset

        if img_path is None:
            info = check_det_dataset(data)
            img_path = info.get("train") or info.get("val")
        self.dataset = YOLODataset(img_path, imgsz=imgsz, augment=False, cache=False)
        self.model = model
        self.imgsz = imgsz
        self.batch = batch
        self.embeddings: np.ndarray | None = None

    def _embed_fn(self):
        model = self.model
        variables = model.variables

        @jax.jit
        def fn(x):
            _, feats = model.graph.apply(variables, x.astype(model.dtype) / 255.0, train=False)
            emb = jnp.mean(feats[-1], axis=(1, 2))  # GAP of the deepest level
            return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-9)

        return fn

    def create_embeddings_table(self, force: bool = False, cache: str | Path | None = None):
        if cache and Path(cache).exists() and not force:
            self.embeddings = np.load(cache)["emb"]
            return self.embeddings
        assert self.model is not None, "Explorer needs a model to embed with"
        fn = self._embed_fn()
        embs = []
        n = len(self.dataset)
        for i in range(0, n, self.batch):
            idxs = list(range(i, min(i + self.batch, n)))
            imgs = [self.dataset.get_sample(j)["img"][..., ::-1] for j in idxs]  # BGR->RGB
            x = np.stack(imgs)
            if len(idxs) < self.batch:  # pad to compiled batch
                x = np.concatenate([x, np.zeros((self.batch - len(idxs), *x.shape[1:]), x.dtype)])
            e = np.asarray(fn(jnp.asarray(x)))[: len(idxs)]
            embs.append(e)
        self.embeddings = np.concatenate(embs)
        if cache:
            np.savez_compressed(cache, emb=self.embeddings)
        LOGGER.info(f"embedded {n} images -> {self.embeddings.shape}")
        return self.embeddings

    def get_similar(self, idx: int | None = None, embedding: np.ndarray | None = None,
                    limit: int = 9):
        """Most similar dataset images by cosine similarity."""
        assert self.embeddings is not None, "call create_embeddings_table() first"
        q = self.embeddings[idx] if embedding is None else embedding
        sims = self.embeddings @ q
        order = np.argsort(-sims)[:limit]
        return [{"idx": int(i), "im_file": self.dataset.im_files[int(i)],
                 "similarity": float(sims[i])} for i in order]

    def similarity_index(self, top_k: int = 5, threshold: float = 0.9):
        """Per-image list of near-duplicates above a similarity threshold."""
        assert self.embeddings is not None
        sims = self.embeddings @ self.embeddings.T
        np.fill_diagonal(sims, -1)
        out = []
        for i in range(len(sims)):
            close = np.argsort(-sims[i])[:top_k]
            close = [int(j) for j in close if sims[i, j] >= threshold]
            out.append({"idx": i, "similar": close})
        return out
