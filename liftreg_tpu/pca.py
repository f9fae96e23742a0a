"""PCA statistical-deformation-subspace construction.

The reference repo consumes a prebuilt basis (``pca_vectors.npy``,
``pca_mean.npy`` downloaded from a Drive link, ``README.md:34-36``) but does
NOT ship the construction script. This module provides it: fit a PCA over a
set of displacement fields and write the basis in the exact on-disk layout
the models load (vectors ``(latent, 3*D*W*H)``, mean ``(3*D*W*H,)`` —
``LiftRegDeformSubspaceBackproj.py:42-43``).

Dimensionality is huge (3*160^3 ~ 12.3M) and sample counts small (~100
training pairs), so the snapshot/Gram-matrix method is used: eigendecompose
the (M, M) Gram matrix of centered snapshots instead of the covariance.
"""
from __future__ import annotations

import os
from typing import Iterable, Sequence

import numpy as np


def fit_pca(disp_fields, n_components, chunk=8, scale_by_stddev=False):
    """Fit PCA over displacement snapshots.

    Args:
      disp_fields: array-like ``(M, K)`` or iterable of ``(K,)`` /
        ``(3, D, W, H)`` arrays (flattened internally).
      n_components: latent dimension L <= M.
      chunk: row chunk for Gram accumulation.
      scale_by_stddev: scale each component by its standard deviation
        ``sqrt(lambda_i / (M-1))`` so the coefficients a network must
        regress are ~N(0,1) instead of O(||disp||) — markedly easier
        optimization for the subspace head.

    Returns:
      (vectors ``(L, K)`` float32 — principal directions, unit-norm rows
      like sklearn's ``components_`` unless ``scale_by_stddev``;
      mean ``(K,)`` float32).
    """
    if not isinstance(disp_fields, np.ndarray):
        disp_fields = np.stack([np.asarray(d).reshape(-1)
                                for d in disp_fields])
    X = disp_fields.reshape(disp_fields.shape[0], -1).astype(np.float64)
    M, K = X.shape
    if n_components > M:
        raise ValueError(f"n_components={n_components} > samples={M}")
    mean = X.mean(axis=0)
    Xc = X - mean
    gram = np.zeros((M, M), dtype=np.float64)
    for i in range(0, M, chunk):
        gram[i:i + chunk] = Xc[i:i + chunk] @ Xc.T
    evals, evecs = np.linalg.eigh(gram)
    order = np.argsort(evals)[::-1][:n_components]
    evals = np.maximum(evals[order], 1e-12)
    evecs = evecs[:, order]
    # principal directions: V = Xc^T U / sqrt(lambda), unit-norm rows
    vectors = (Xc.T @ (evecs / np.sqrt(evals))).T
    if scale_by_stddev:
        vectors = vectors * np.sqrt(evals / max(M - 1, 1))[:, None]
    return vectors.astype(np.float32), mean.astype(np.float32)


def save_pca(out_dir, vectors, mean):
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "pca_vectors.npy"), vectors)
    np.save(os.path.join(out_dir, "pca_mean.npy"), mean)


def explained_variance_ratio(disp_fields, vectors, mean):
    """Diagnostic: fraction of snapshot variance captured by the basis."""
    X = np.stack([np.asarray(d).reshape(-1) for d in disp_fields]).astype(np.float64)
    Xc = X - mean
    coefs = Xc @ vectors.T.astype(np.float64)
    recon = coefs @ vectors.astype(np.float64)
    total = float(np.sum(Xc ** 2))
    return float(np.sum(recon ** 2) / max(total, 1e-12))
