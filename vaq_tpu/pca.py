"""PCA rotation training: covariance, eigendecomposition, subspace balancing.

Replaces the reference train-time rotation pipeline (``VAQ.cpp:11-336``):

* Uncentered covariance XᵀX (the reference does NOT subtract the mean,
  VAQ.cpp:37) over a sample of ≤ 1000·d rows, accumulated in 256k-row blocks.
* Eigendecomposition: the reference runs the general (complex)
  ``Eigen::EigenSolver`` on the symmetric matrix (VAQ.cpp:61); we use
  ``jnp.linalg.eigh`` — mathematically identical spectrum, real arithmetic,
  and much better suited to XLA (SURVEY §2.1 V2).
* Eigencolumns sorted by descending eigenvalue (VAQ.cpp:80-100).
* Partial variance balancing: swap column i ↔ i·L+(L−1) for i = 1.. while the
  per-subspace eigenvalue sums stay descending; undo + stop at the first
  violation (VAQ.cpp:236-280).
* Per-dim explained variance normalized and clamped at 1e-12 (VAQ.cpp:309-313),
  per-subspace sums, cumulative sums, and the `highest_subs` truncation that
  keeps subspaces while cumvar ≤ percent_var_explained (VAQ.cpp:324-334).
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp
import numpy as np

from vaq_tpu.rng import DEFAULT_SEED, sample_rows

COV_BLOCK_ROWS = 256 * 1024      # VAQ.cpp:16
COV_SAMPLE_PER_DIM = 1000        # VAQ.cpp:17


@dataclasses.dataclass
class RotationResult:
    eigvecs: np.ndarray          # (d, d) f32, columns in final (sorted+swapped) order
    eigvals: np.ndarray          # (d,) f32, same order
    var_per_dim: np.ndarray      # normalized + clamped explained variance
    var_per_subs: np.ndarray     # per-subspace sums
    cum_var_per_subs: np.ndarray
    highest_subs: int            # number of kept subspaces
    subs_len: int                # dims per subspace L


@jax.jit
def _uncentered_cov(x: jnp.ndarray) -> jnp.ndarray:
    """XᵀX accumulated in blocks (f32, matching the reference's numerics)."""
    d = x.shape[1]
    n = x.shape[0]
    if n <= COV_BLOCK_ROWS:
        return jnp.dot(x.T, x, preferred_element_type=jnp.float32)
    pad = (-n) % COV_BLOCK_ROWS
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    blocks = xp.reshape(-1, COV_BLOCK_ROWS, d)

    def body(acc, blk):
        return acc + jnp.dot(blk.T, blk, preferred_element_type=jnp.float32), None

    cov, _ = jax.lax.scan(body, jnp.zeros((d, d), jnp.float32), blocks)
    return cov


def train_rotation(
    x: np.ndarray,
    subspace_num: int,
    percent_var_explained: float = 1.0,
    seed: int = DEFAULT_SEED,
) -> RotationResult:
    """Compute the (sorted, variance-balanced) PCA rotation and truncation."""
    x = np.asarray(x, dtype=np.float32)
    d = x.shape[1]
    subs_len = (d + subspace_num - 1) // subspace_num  # ceil, VAQ.cpp:104-107
    if d % subspace_num != 0:
        raise ValueError(
            f"dims {d} must be pre-padded to a multiple of subspace_num "
            f"{subspace_num} (use io.pad_dims)"
        )

    sample = sample_rows(x, COV_SAMPLE_PER_DIM * d, seed)
    cov = np.asarray(_uncentered_cov(jnp.asarray(sample)))

    # Symmetric eigendecomposition; eigh returns ascending order.
    evals, evecs = np.linalg.eigh(cov.astype(np.float64))
    order = np.argsort(-evals, kind="stable")
    evals = evals[order]
    evecs = evecs[:, order]

    # Partial variance balancing swaps (VAQ.cpp:262-280).
    L, M = subs_len, subspace_num
    idx = np.arange(d)

    def subs_sums(e):
        return e[: M * L].reshape(M, L).sum(axis=1)

    max_swap = min(L, M)
    for i in range(1, max_swap):
        j = i * L + (L - 1)
        idx[[i, j]] = idx[[j, i]]
        if not np.all(np.diff(subs_sums(evals[idx])) <= 0):
            idx[[i, j]] = idx[[j, i]]  # undo and stop
            break

    evals = evals[idx]
    evecs = evecs[:, idx]

    # Explained variance, normalized then clamped (VAQ.cpp:301-313).
    var_per_dim = evals / evals.sum()
    var_per_dim = np.maximum(var_per_dim, 1e-12)
    var_per_subs = var_per_dim[: M * L].reshape(M, L).sum(axis=1)
    cum_var = np.cumsum(var_per_subs)

    if percent_var_explained < 1.0:
        highest = 0
        for i in range(M):
            if cum_var[i] <= percent_var_explained:
                highest = i
        highest += 1
    else:
        highest = M

    return RotationResult(
        eigvecs=evecs.astype(np.float32),
        eigvals=evals.astype(np.float32),
        var_per_dim=var_per_dim.astype(np.float32),
        var_per_subs=var_per_subs.astype(np.float32),
        cum_var_per_subs=cum_var.astype(np.float64),
        highest_subs=int(highest),
        subs_len=int(subs_len),
    )


def project(x, eigvecs, total_dim: int | None = None):
    """Project rows onto the rotation (reference ProjectOnEigenVectors,
    VAQ.hpp:198-305 — a blocked sgemm there, a single XLA matmul here)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    ev = jnp.asarray(eigvecs, dtype=jnp.float32)
    if total_dim is not None:
        ev = ev[:, :total_dim]
    return jnp.dot(x, ev, preferred_element_type=jnp.float32)
