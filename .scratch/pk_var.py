"""Kernel-variant lab for the groupmin probe kernel (timing-only variants;
correctness variants graduate into ops/probe_pallas.py)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from vaq_tpu.ops import probe_pallas  # noqa: E402


def make_kernel(gs, it, xn_mode="transpose", do_min=True, unroll=True):
    def kern(qsl_ref, rows_ref, norms_ref, out_ref):
        rt = rows_ref.shape[0]
        qcap = qsl_ref.shape[1]
        q = qsl_ref[0]
        qf = q.astype(jnp.float32)
        qn = 0.25 * jnp.sum(qf * qf, axis=1, keepdims=True).T

        def body(i):
            rows = rows_ref[i * it:(i + 1) * it, :].astype(jnp.bfloat16)
            dot = jax.lax.dot_general(
                rows, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if xn_mode == "transpose":
                xn = jnp.transpose(norms_ref[0, 0:1, i * it:(i + 1) * it],
                                   (1, 0))
                dist = (dot + xn) + qn
            elif xn_mode == "inkernel":
                rf = rows.astype(jnp.float32)
                xn = jnp.sum(rf * rf, axis=1, keepdims=True)
                dist = (dot + xn) + qn
            elif xn_mode == "inkernel_mxu":
                sq = (rows * rows).astype(jnp.bfloat16)
                ones = jnp.ones((rows.shape[1], 8), jnp.bfloat16)
                xn = jax.lax.dot_general(
                    sq, ones, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[:, 0:1]
                dist = (dot + xn) + qn
            else:  # none
                dist = dot + qn
            if do_min:
                out_ref[i * (it // gs):(i + 1) * (it // gs), :] = jnp.min(
                    dist.reshape(it // gs, gs, qcap), axis=1)
            else:
                out_ref[i * (it // gs):(i + 1) * (it // gs), :] = \
                    dist[: it // gs, :]

        for i in range(rt // it):
            body(i)
    return kern


@functools.partial(jax.jit, static_argnames=(
    "ncl", "cap", "gs", "rt", "it", "xn_mode", "do_min"))
def scan_var(qsl, rows, norms, ncl, cap, gs, rt, it, xn_mode="transpose",
             do_min=True):
    qcap, d = qsl.shape[1], qsl.shape[2]
    ntiles = cap // rt
    ng = cap // gs
    return pl.pallas_call(
        make_kernel(gs, it, xn_mode, do_min),
        grid=(ncl, ntiles),
        in_specs=[
            pl.BlockSpec((1, qcap, d), lambda c, t: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, d), lambda c, t: (c * (cap // rt) + t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt), lambda c, t: (c * (cap // rt) + t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt // gs, qcap),
                               lambda c, t: (c * (cap // rt) + t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncl * ng, qcap), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(qsl, rows, norms.reshape(ncl * ntiles, 1, rt))


class Lab:
    def __init__(self, ncl=1000, cap=1536, qcap=128, d=128, dtype="int8"):
        self.ncl, self.cap, self.qcap, self.d = ncl, cap, qcap, d
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        if dtype == "int8":
            self.rows = jax.random.randint(k1, (ncl * cap, d), -127, 128,
                                           jnp.int8)
        else:
            self.rows = jax.random.normal(
                k1, (ncl * cap, d), jnp.float32).astype(jnp.bfloat16)

        @jax.jit
        def nb(blk):
            f = blk.astype(jnp.float32)
            return jnp.sum(f * f, axis=1)

        outs = []
        for s0 in range(0, ncl * cap, 1 << 21):
            outs.append(nb(self.rows[s0:s0 + (1 << 21)]))
        self.norms = jnp.concatenate(outs)
        self.qsl = jax.random.normal(k2, (ncl, qcap, d),
                                     jnp.float32).astype(jnp.bfloat16)

    def t(self, gs, rt, it, xn_mode="transpose", do_min=True, iters=8):
        def fn(q):
            return scan_var(q, self.rows, self.norms, self.ncl, self.cap,
                            gs, rt, it, xn_mode, do_min)

        t0 = time.perf_counter()
        float(jnp.sum(fn(self.qsl)[0, 0]))   # compile+claim
        tc = time.perf_counter() - t0

        def chain(n):
            q = self.qsl
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(q)
                eps = (jnp.sum(out[0, 0]) * 1e-30).astype(jnp.bfloat16)
                q = self.qsl + eps
            float(jnp.sum(q))
            return time.perf_counter() - t0

        t1 = min(chain(1) for _ in range(3))
        tn = min(chain(iters) for _ in range(3))
        ms = (tn - t1) / (iters - 1) * 1000
        print(f"gs={gs} rt={rt} it={it} xn={xn_mode} min={do_min}: "
              f"{ms:.2f} ms (compile {tc:.0f}s)", flush=True)
        return ms
