#!/usr/bin/env python
"""Sharded-vs-unsharded IVF recall equality at 100k rows (VERDICT r4 #4
"Done" criterion: not just the 4k CPU fixture).

Runs on 8 virtual CPU devices (the driver's dryrun environment): builds a
100k×128d index, attaches the int8 probe tier, and compares unsharded
probe recall (with the exact second-stage rescore) against the
cluster-sharded probe (with the distributed rescore) at visit=1.0 —
identical stage-1 candidate sets, so recall must match within int8-metric
tie noise. Writes scripts/sharded_100k_check.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    import vaq_tpu
    from vaq_tpu import metrics
    from vaq_tpu.ivf import attach_ivf
    from vaq_tpu.ops.distances import exact_search
    from vaq_tpu.parallel import make_mesh

    n, d, nq, k = 100_000, 128, 256, 10
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".bench_cache", "data_n1000000_d128_q1024.npz")
    with np.load(cache) as z:
        base, queries = z["base"][:n], z["queries"][:nq]
    _, gt = exact_search(jnp.asarray(queries), jnp.asarray(base), k)
    gt = np.asarray(gt)

    cfg = vaq_tpu.parse_method_string("VAQ256m32min7max8var1,TI64m16")
    idx = vaq_tpu.VAQIndex(cfg).train(base).encode(base)
    attach_ivf(idx, visit=1.0)
    _, l_ref = idx.search(queries, k)
    r_ref = metrics.avg_recall(l_ref, gt, k)

    mesh = make_mesh((8,), ("db",))
    idx.shard(mesh, tiers=("decoded", "ivf"))
    assert idx._sharded_ivf.rescore_rows is not None
    _, l_sh = idx.search(queries, k)
    r_sh = metrics.avg_recall(l_sh, gt, k)
    agree = float(np.mean(l_sh[:, 0] == l_ref[:, 0]))

    out = {"n": n, "nq": nq, "k": k, "devices": 8,
           "unsharded_recall": round(float(r_ref), 4),
           "sharded_recall": round(float(r_sh), 4),
           "delta": round(float(r_sh - r_ref), 4),
           "top1_agreement": round(agree, 4)}
    print(json.dumps(out))
    assert abs(r_sh - r_ref) < 0.005, out
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "sharded_100k_check.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
