"""Direct unit tests for the group-min probe kernel (VERDICT r3 #3/#8).

These pin the kernel's intended block shapes (ntiles=1, ntiles>1,
qcap < 128, both row dtypes) against a plain-XLA reference that computes
the same bf16-dot / f32-accumulate distances — in interpret mode on CPU
(the Mosaic lowering itself is gated on hardware by
``ops/kernel_check.kernel_parity_fields`` every bench run).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vaq_tpu.ops import probe_pallas


def _reference_groupmin(qsl, rows, dim_w, ncl, cap, gs):
    """Same math as the kernel, in plain jnp: dist = ‖x̂‖² − 2qx̂ + ‖q‖²."""
    qcap, d = qsl.shape[1], qsl.shape[2]
    r = rows.reshape(ncl, cap, d).astype(jnp.bfloat16)
    qf = qsl.astype(jnp.float32)
    qn = 0.25 * jnp.sum(qf * qf, axis=2)                    # (ncl, qcap)
    dot = jnp.einsum("cqd,crd->crq", qsl, r,
                     preferred_element_type=jnp.float32)    # −2qx̂
    rf = r.astype(jnp.float32)
    xn = jnp.sum(rf * rf * dim_w[None, None, :], axis=2)    # (ncl, cap)
    dist = dot + xn[:, :, None] + qn[:, None, :]
    return jnp.min(dist.reshape(ncl, cap // gs, gs, qcap), axis=2)


def _make_inputs(ncl, cap, qcap, d, dtype, seed=0):
    rng = np.random.default_rng(seed)
    rows = rng.standard_normal((ncl * cap, d)).astype(np.float32)
    if dtype == "int8":
        rows = np.clip(np.round(rows * 32.0), -127, 127).astype(np.int8)
        # poison a few trailing slots per cluster, as build_ivf does
        rows.reshape(ncl, cap, d)[:, -3:] = \
            probe_pallas.poison_pattern(d)[None, None, :]
        dim_w = jnp.full((d,), 1.0 / (32.0 * 32.0), jnp.float32)
    else:
        rows.reshape(ncl, cap, d)[:, -3:] = 1e15
        rows = rows.astype(jnp.bfloat16)
        dim_w = jnp.ones((d,), jnp.float32)
    q = rng.standard_normal((ncl, qcap, d)).astype(np.float32)
    qsl = jnp.asarray((-2.0 * q).astype(jnp.bfloat16))
    return qsl, jnp.asarray(rows), dim_w


@pytest.mark.parametrize("dtype", ["bf16", "int8"])
@pytest.mark.parametrize("ncl,cap,rt,gs,qcap", [
    (3, 512, 512, 8, 128),      # ntiles = 1
    (2, 1024, 512, 16, 128),    # ntiles = 2
    (2, 512, 512, 8, 64),       # qcap < 128 (small strict batches)
    (1, 1536, 512, 8, 128),     # the 1M bench bucket shape (scaled down)
])
def test_groupmin_matches_reference(dtype, ncl, cap, rt, gs, qcap):
    qsl, rows, dim_w = _make_inputs(ncl, cap, qcap, 128, dtype)
    out = probe_pallas.groupmin_window_scan(
        qsl, rows, dim_w, ncl, cap, gs=gs, rt=rt, interpret=True)
    ref = _reference_groupmin(qsl, rows, dim_w, ncl, cap, gs)
    assert out.shape == (ncl, cap // gs, qcap)
    o = np.asarray(out, dtype=np.float32)
    r = np.asarray(ref, dtype=np.float32)
    fin = np.isfinite(r)
    np.testing.assert_array_equal(np.isfinite(o), fin)
    # f32 mins, deliberately NOT bf16: the bf16 variant collapsed bench
    # recall (window gaps rounded away under the large per-query offset)
    denom = np.maximum(np.abs(r[fin]), 1.0)
    assert np.max(np.abs(o[fin] - r[fin]) / denom) < 2e-5


@pytest.mark.parametrize("dtype", ["bf16", "int8"])
@pytest.mark.parametrize("d", [96, 64])
def test_groupmin_transposed_matches_rowmajor(dtype, d):
    """The (d, cap) transposed layout (d % 128 != 0 storage — the 100M
    DEEP-96 fix) must score identically to the row-major kernel: same bf16
    products, only reduction order may differ."""
    ncl, cap, rt, gs, qcap = 3, 1024, 512, 16, 128
    qsl, rows, dim_w = _make_inputs(ncl, cap, qcap, d, dtype)
    out_std = probe_pallas.groupmin_window_scan(
        qsl, rows, dim_w, ncl, cap, gs=gs, rt=rt, interpret=True)
    rows_np = np.asarray(rows.astype(jnp.float32)).reshape(ncl, cap, d)
    rows_t = np.ascontiguousarray(rows_np.transpose(0, 2, 1))
    rows_t = jnp.asarray(rows_t).astype(rows.dtype).reshape(ncl * d, cap)
    out_t = probe_pallas.groupmin_window_scan(
        qsl, rows_t, dim_w, ncl, cap, gs=gs, rt=rt, transposed=True,
        interpret=True)
    o, r = (np.asarray(a, dtype=np.float32) for a in (out_t, out_std))
    fin = np.isfinite(r)
    np.testing.assert_array_equal(np.isfinite(o), fin)
    denom = np.maximum(np.abs(r[fin]), 1.0)
    assert np.max(np.abs(o[fin] - r[fin]) / denom) < 2e-5


@pytest.mark.parametrize("dtype", ["bf16", "int8"])
def test_groupmin_padding_ranks_last(dtype):
    """Padding slots (bf16 sentinel / int8 poison) must rank at or above
    every live row: a window of pure padding never beats a live window."""
    ncl, cap, gs, qcap = 2, 512, 8, 128
    qsl, rows, dim_w = _make_inputs(ncl, cap, qcap, 128, dtype)
    pad_val = (probe_pallas.poison_pattern(128) if dtype == "int8"
               else np.full(128, 1e15, np.float32))
    rows = np.array(rows.astype(jnp.float32))
    rows.reshape(ncl, cap, 128)[1, 64:64 + gs] = pad_val
    rows = jnp.asarray(rows).astype(jnp.int8 if dtype == "int8"
                                    else jnp.bfloat16)
    out = np.asarray(probe_pallas.groupmin_window_scan(
        qsl, rows, dim_w, ncl, cap, gs=gs, rt=512, interpret=True))
    pad_win = out[1, 64 // gs]        # (qcap,) all-padding window
    live_min = out[1].min(axis=0)     # best window per slot
    assert (pad_win >= live_min).all()
    if dtype == "bf16":
        assert (pad_win >= probe_pallas.SENTINEL_DIST).all()


def test_window_minima_must_stay_f32():
    """Pin the r4 recall-collapse class (VERDICT r4 #6): bench-shaped
    window minima carry a large per-query constant (for int8 buckets qn is
    ‖q/s‖², scale-inflated to ~10⁴), so bf16's 8 mantissa bits quantize
    away the O(1) inter-window gaps and the top-m window selection
    collapses (measured on chip in r4: recall 0.32→0.23 at 1M). This test
    reproduces that candidate-set degradation on CPU in milliseconds so the
    next precision experiment fails here, not after a full TPU bench."""
    rng = np.random.default_rng(7)
    ng, gs, k = 4096, 16, 10
    # bench-shaped distances: offset ~1e4 (the int8 scale-inflated ‖q/s‖²
    # constant), inter-row spread O(1..100)
    d = (1e4 + 50.0 * rng.gamma(2.0, 2.0, size=(ng * gs,))).astype(
        np.float32)
    true_top = np.argsort(d)[:k]
    true_windows = set(true_top // gs)
    mins_f32 = d.reshape(ng, gs).min(axis=1)
    m = 2 * k

    def window_recall(mins):
        top_w = set(np.argsort(mins, kind="stable")[:m].tolist())
        return len(true_windows & top_w) / len(true_windows)

    assert window_recall(mins_f32) == 1.0
    mins_bf16 = np.asarray(
        jnp.asarray(mins_f32).astype(jnp.bfloat16).astype(jnp.float32))
    # bf16 step at 1e4 is ~64: the gaps quantize to ties and the selection
    # degrades — this is the collapse the kernel's f32 output prevents
    assert window_recall(mins_bf16) < 0.8
    # and the kernel must actually emit f32 minima
    qsl, rows, dim_w = _make_inputs(2, 512, 128, 128, "int8")
    out = probe_pallas.groupmin_window_scan(
        qsl, rows, dim_w, 2, 512, gs=8, rt=512, interpret=True)
    assert out.dtype == jnp.float32


def test_pick_inner_tile_respects_budget_and_divisibility():
    # large qcap must shrink the tile (ADVICE r3 low #3)
    small = probe_pallas.pick_inner_tile(15360, 32, 1024, 128)
    large = probe_pallas.pick_inner_tile(15360, 32, 128, 128)
    assert small <= large
    for rt, gs, qcap in [(512, 8, 128), (15360, 32, 1024), (1536, 64, 256)]:
        it = probe_pallas.pick_inner_tile(rt, gs, qcap, 128)
        assert rt % it == 0 and it % gs == 0
        if it > gs:
            assert it * (6 * 128 + 12 * qcap) <= probe_pallas._TEMP_BUDGET


def test_pick_row_tile_fits_vmem():
    for cap, gs, qcap, isz in [(15360, 32, 128, 2), (15360, 32, 128, 1),
                               (1536, 8, 128, 1), (1536, 8, 1024, 2),
                               (104960, 64, 128, 1)]:
        rt = probe_pallas.pick_row_tile(cap, gs, qcap, 128, isz)
        assert cap % rt == 0 and rt % (8 * gs) == 0 and rt % 512 == 0
        assert (2 * rt * 128 * isz + 2 * (rt // gs) * qcap * 2
                <= probe_pallas._SLAB_BUDGET) or rt == 512


def test_pick_row_tile_mosaic_legality():
    """ADVICE r4 medium: the out BlockSpec is (rt//gs, qcap) and Mosaic
    needs its second-to-minor dim divisible by 8. cap = 512·33 at gs=128
    has no admissible rt (every divisor gives rt//gs ≡ 4 mod 8) — the
    picker must return None and pick_gs_rt must back off to a legal gs."""
    cap = 512 * 33  # 16896, a real _round_cap output (cap ≤ 32768 → q=512)
    assert probe_pallas.pick_row_tile(cap, 128, 128, 96, 1) is None
    gs, rt = probe_pallas.pick_gs_rt(cap, 128, 96, 1)
    assert rt is not None and cap % rt == 0 and rt % (8 * gs) == 0
    assert gs <= 64  # backed off from the 128 the 240-window rule wants


def test_pick_gs_rt_prefers_large_groups_when_legal():
    # cap = 2^k: gs reaches the window-count target and rt stays legal
    for cap in (32768, 131072):
        gs, rt = probe_pallas.pick_gs_rt(cap, 128, 96, 1)
        assert gs == 256  # the window-count target drives gs to the cap
        assert cap % rt == 0 and rt % (8 * gs) == 0
    # tiny caps keep gs = 8 and the minimum tile
    gs, rt = probe_pallas.pick_gs_rt(512, 128, 128, 2)
    assert (gs, rt) == (8, 512)
