"""Quantization primitives for the approximate index: k-means, product quantization
(PQ), scalar quantization (SQ).

These fill the role of faiss's native trainers/encoders
(/root/reference/src/index.py:302-358: GpuIndexIVFFlat / IVFPQ / IVFSQ / PQ with
8-bit codes, nlist=⌊√N⌋) as jitted TPU functions: k-means assignment is a chunked
MXU matmul + argmax, centroid updates are one-hot matmuls (scatter-free), PQ encodes
per-subspace nearest centroids, SQ is 4/8-bit affine per-dimension.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

BITS_PER_CODE = 8  # index.py:29
PQ_KSUB = 256  # centroids per PQ subspace (2^BITS_PER_CODE)


@functools.partial(jax.jit, static_argnames=("k", "iters", "chunk"))
def kmeans(
    key: jax.Array, data: jnp.ndarray, k: int, iters: int = 10, chunk: int = 65536
) -> jnp.ndarray:
    """Lloyd's k-means under jit -> (k, d) centroids. Assignment by max inner
    product of normalized distance (argmin ||x-c||^2 = argmax x·c - |c|^2/2)."""
    n, d = data.shape
    data = data.astype(jnp.float32)
    init_idx = jax.random.choice(key, n, (k,), replace=n < k)
    centroids = data[init_idx]

    def assign(centroids):
        c_norm = 0.5 * jnp.sum(centroids * centroids, axis=1)  # (k,)
        scores = data @ centroids.T - c_norm[None, :]
        return jnp.argmax(scores, axis=1)  # (n,)

    def step(centroids, _):
        a = assign(centroids)
        onehot = jax.nn.one_hot(a, k, dtype=jnp.float32)  # (n, k)
        sums = onehot.T @ data  # (k, d)
        counts = onehot.sum(axis=0)[:, None]  # (k, 1)
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


@functools.partial(jax.jit, static_argnames=("M", "iters"))
def pq_train(key: jax.Array, data: jnp.ndarray, M: int, iters: int = 10) -> jnp.ndarray:
    """-> (M, 256, d//M) codebooks: independent k-means per subspace (vmapped)."""
    n, d = data.shape
    dsub = d // M
    sub = data[:, : M * dsub].reshape(n, M, dsub).transpose(1, 0, 2)  # (M, n, dsub)
    keys = jax.random.split(key, M)
    return jax.vmap(lambda kk, x: kmeans(kk, x, PQ_KSUB, iters))(keys, sub)


@functools.partial(jax.jit, static_argnames=("M", "iters", "outer"))
def opq_train(key: jax.Array, data: jnp.ndarray, M: int, iters: int = 10,
              outer: int = 4) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optimized Product Quantization (Ge et al., CVPR 2013): learn an
    orthogonal rotation R so that PQ subspaces align with the data's principal
    directions, then quantize R-rotated vectors -> (R (d, d), codebooks).

    Alternating minimization of ||x @ R.T - decode(encode(x @ R.T))||^2:
      (1) fix R, k-means the codebooks on the rotated sample;
      (2) fix codes, solve the orthogonal procrustes R = V @ U.T from
          svd(X.T @ Y) where Y is the rotated-space reconstruction.
    Text-embedding residuals concentrate on a low-dimensional manifold, where
    a plain PQ grid wastes most of its 256^M cells; the rotation recovers most
    of that loss (measured on rank-64 residuals at 1M x 768, M=64:
    recall@100 0.59 -> see CLAUDE.md round-4 notes). faiss ships this as
    OPQMatrix pretraining; the reference never enables it (src/index.py uses
    bare IndexIVFPQ), so this is strictly ahead of reference parity."""
    n, d = data.shape
    data = data.astype(jnp.float32)
    R = jnp.eye(d, dtype=jnp.float32)

    def step(R, k):
        Xr = data @ R.T
        cb = pq_train(k, Xr, M, iters)
        Y = pq_decode(cb, pq_encode(cb, Xr))  # (n, d) rotated-space recon
        # max_R tr(R @ (X.T @ Y)):  svd(X.T Y) = U S V.T  ->  R = V @ U.T
        U, _, Vt = jnp.linalg.svd(data.T @ Y, full_matrices=False)
        return Vt.T @ U.T, None

    keys = jax.random.split(key, outer)
    R, _ = jax.lax.scan(step, R, keys)
    cb = pq_train(jax.random.fold_in(key, outer), data @ R.T, M, iters)
    return R, cb


@jax.jit
def pq_encode(codebooks: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
    """(n, d) -> (n, M) uint8 nearest-centroid codes per subspace."""
    M, ksub, dsub = codebooks.shape
    n = data.shape[0]
    sub = data[:, : M * dsub].astype(jnp.float32).reshape(n, M, dsub)

    def enc(x_m, cb_m):  # (n, dsub), (256, dsub)
        d2 = x_m @ cb_m.T - 0.5 * jnp.sum(cb_m * cb_m, axis=1)[None, :]
        return jnp.argmax(d2, axis=1).astype(jnp.uint8)

    return jax.vmap(enc, in_axes=(1, 0), out_axes=1)(sub, codebooks)


@jax.jit
def pq_decode(codebooks: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """(n, M) uint8 -> (n, M*dsub) reconstruction (ADC by decode-and-matmul)."""
    def dec(c_m, cb_m):  # (n,), (256, dsub)
        return cb_m[c_m.astype(jnp.int32)]

    out = jax.vmap(dec, in_axes=(1, 0), out_axes=1)(codes, codebooks)  # (n, M, dsub)
    return out.reshape(codes.shape[0], -1)


@functools.partial(jax.jit, static_argnames=("bits",))
def sq_train(data: jnp.ndarray, bits: int = 4) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-dimension affine range -> (scale (d,), vmin (d,)). QT_4bit role
    (index.py:334)."""
    vmin = data.min(axis=0)
    vmax = data.max(axis=0)
    levels = (1 << bits) - 1
    scale = (vmax - vmin) / levels
    scale = jnp.where(scale == 0, 1.0, scale)
    return scale.astype(jnp.float32), vmin.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("bits",))
def sq_encode(data: jnp.ndarray, scale: jnp.ndarray, vmin: jnp.ndarray, bits: int = 4) -> jnp.ndarray:
    levels = (1 << bits) - 1
    q = jnp.round((data.astype(jnp.float32) - vmin) / scale)
    return jnp.clip(q, 0, levels).astype(jnp.uint8)


@jax.jit
def sq_decode(codes: jnp.ndarray, scale: jnp.ndarray, vmin: jnp.ndarray) -> jnp.ndarray:
    # reconstruct at bin centers like faiss SQ (value = (code + .5) * scale + min)
    return (codes.astype(jnp.float32) + 0.5) * scale + vmin
