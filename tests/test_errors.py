"""Typed failure surface (SURVEY §5 "failure handling"; the reference fails
with bare assert(false)/exit(1) — a library needs catchable, typed errors).
All classes subclass ValueError for backward compatibility."""

import numpy as np
import pytest

import vaq_tpu
from vaq_tpu import (ConfigError, FormatError, NotReadyError, ShapeError,
                     VAQError)


def test_hierarchy():
    for cls in (ConfigError, NotReadyError, ShapeError, FormatError):
        assert issubclass(cls, VAQError)
        assert issubclass(cls, ValueError)


def test_search_before_train():
    idx = vaq_tpu.VAQIndex(vaq_tpu.parse_method_string("VAQ64m8,SORT"))
    with pytest.raises(NotReadyError):
        idx.search(np.zeros((2, 64), np.float32), 5)


def test_encode_before_train():
    idx = vaq_tpu.VAQIndex(vaq_tpu.parse_method_string("VAQ64m8,SORT"))
    with pytest.raises(NotReadyError):
        idx.encode(np.zeros((10, 64), np.float32))


def test_search_before_encode():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 16)).astype(np.float32)
    idx = vaq_tpu.VAQIndex(
        vaq_tpu.parse_method_string("VAQ16m4min2max6var1,SORT")).train(x)
    with pytest.raises(NotReadyError):
        idx.search(x[:2], 5)


def test_query_dim_mismatch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 16)).astype(np.float32)
    idx = vaq_tpu.VAQIndex(
        vaq_tpu.parse_method_string("VAQ16m4min2max6var1,SORT")
    ).train(x).encode(x)
    with pytest.raises(ShapeError):
        idx.search(rng.standard_normal((2, 24)).astype(np.float32), 5)
    with pytest.raises(ShapeError):
        idx.search(x[0], 5)  # 1-D input


def test_fast_config_bits_gate():
    with pytest.raises(ConfigError):
        vaq_tpu.parse_method_string("VAQ256m32min7max8var1,FAST")


def test_codes_backend_rejects_wide_bits():
    # The decode-then-dot codes tier packs 2^bits rows per subspace and u8
    # codes; explicit backend="codes" on a >8-bit index must raise (both the
    # host search() and device search_device() dispatchers), not truncate.
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((4096, 32)) *
         np.linspace(3, 0.1, 32)).astype(np.float32)
    idx = vaq_tpu.VAQIndex(
        vaq_tpu.parse_method_string("VAQ40m4min5max12var1,HEAP")
    ).train(x).encode(x)
    assert int(idx.bits.max()) > 8
    with pytest.raises(ConfigError):
        idx.search(x[:4], 5, backend="codes")
    with pytest.raises(ConfigError):
        idx.search_device(jnp.asarray(x[:4]), 5, backend="codes")


def test_infeasible_bit_budget():
    from vaq_tpu.bitalloc import allocate_bits
    with pytest.raises(ConfigError):
        # budget above m*ub is infeasible
        allocate_bits(np.ones(4), 100, 1, 8)


def test_ivf_without_clusters():
    from vaq_tpu.ivf import build_ivf
    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 16)).astype(np.float32)
    idx = vaq_tpu.VAQIndex(
        vaq_tpu.parse_method_string("VAQ16m4min2max6var1,SORT")
    ).train(x).encode(x)
    with pytest.raises(ConfigError):
        build_ivf(idx)


def test_bad_dataset_file(tmp_path):
    from vaq_tpu.io import read_fvecs
    p = tmp_path / "bad.fvecs"
    # leading dim of -1 is invalid
    np.array([-1], dtype=np.int32).tofile(p)
    with pytest.raises(FormatError):
        read_fvecs(str(p))
