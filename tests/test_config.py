"""Method-string DSL parity tests (reference VAQ.cpp:1189-1267)."""

import pytest

from vaq_tpu.config import (SearchMethod, VAQConfig, format_method_string,
                            parse_hardcoded_bits, parse_method_string)


def test_run_demos_config():
    # The canonical siftsmall invocation (scripts/run_demos.sh:11).
    cfg = parse_method_string("VAQ256m32min7max8var1,HEAP")
    assert cfg.bit_budget == 256
    assert cfg.subspace_num == 32
    assert cfg.min_bits == 7
    assert cfg.max_bits == 8
    assert cfg.percent_var_explained == 1.0
    assert cfg.methods == SearchMethod.HEAP


def test_ti_variants():
    cfg = parse_method_string("VAQ256m32min2max13var1,EA_TI1000var0.9")
    assert cfg.methods == SearchMethod.EA | SearchMethod.TI
    assert cfg.ti_cluster_num == 1000
    assert cfg.ti_variance == pytest.approx(0.9)

    cfg = parse_method_string("VAQ256m32min7max10var1,TI100m16")
    assert cfg.ti_cluster_num == 100
    assert cfg.ti_segment_num == 16

    cfg = parse_method_string("VAQ256m64min1max8var1,TI1000")
    assert cfg.ti_cluster_num == 1000
    assert cfg.ti_segment_num == -1


def test_fast_variants():
    cfg = parse_method_string("VAQ256m64min1max4var1,FAST")
    assert cfg.methods == SearchMethod.FAST
    cfg = parse_method_string("VAQ256m64min1max8var1,FAST2")
    assert cfg.methods == SearchMethod.FAST2
    cfg = parse_method_string("VAQ256m64min1max8var1,FAST3")
    assert cfg.methods == SearchMethod.FAST3


def test_fast_maxbits_validation():
    # Reference exits when FAST & max_bits > 4 (VAQ.cpp:1263-1266).
    with pytest.raises(ValueError):
        parse_method_string("VAQ256m64min1max8var1,FAST")


def test_combined_methods_reset():
    base = parse_method_string("VAQ256m32min7max8var1,HEAP")
    cfg = parse_method_string("VAQ256m32min7max8var1,SORT", base=base)
    assert cfg.methods == SearchMethod.SORT  # reset, not OR-ed with HEAP


def test_var_fraction():
    cfg = parse_method_string("VAQ512m64min2max13var0.95,SORT")
    assert cfg.percent_var_explained == pytest.approx(0.95)


def test_hardcoded_bits():
    assert parse_hardcoded_bits("4x8,2x6,1x4") == (8, 8, 8, 8, 6, 6, 4)
    assert parse_hardcoded_bits("8,7,6") == (8, 7, 6)


def test_format_roundtrip():
    for s in ["VAQ256m32min7max8var1,HEAP",
              "VAQ256m32min2max13var1,TI1000var0.9",
              "VAQ256m64min1max8var1,SORT_FAST3"]:
        cfg = parse_method_string(s)
        cfg2 = parse_method_string(format_method_string(cfg))
        assert cfg2 == cfg
