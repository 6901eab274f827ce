"""Quadrature policy env-var knobs (reference default: q = 2p exactly,
palace/utils/configfile.hpp:1077 q_order_jac = false)."""

import os

from palace_tpu.fem import operators as fop
from palace_tpu.fem.reference import Geom


def _with_env(env, fn):
    saved = {k: os.environ.get(k) for k in env}
    try:
        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        fn()
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _reset():
    fop.QuadraturePolicy.jac = False
    fop.QuadraturePolicy.extra = 0
    fop.QuadraturePolicy.simplex_exact_jac = True


def test_default_qorder_plain_2p():
    _reset()
    assert fop.default_qorder(3, 1, Geom.HEX) == 6
    assert fop.default_qorder(3, 1, Geom.TET) == 6


def test_env_truthiness_variants():
    # "0", "false", "no", "off", "" are all falsey; "1"/"true" truthy.
    for val, expect in [("0", False), ("false", False), ("no", False),
                        ("off", False), ("", False), ("1", True),
                        ("TRUE", True)]:
        def check():
            _reset()
            fop._env_policy()
            assert fop.QuadraturePolicy.jac is expect, (val, expect)
        _with_env({"PALACE_TPU_QORDER_JAC": val}, check)
    _reset()
    fop._env_policy()


def test_simplex_exact_jac_escape_hatch():
    def check():
        _reset()
        fop._env_policy()
        assert fop.QuadraturePolicy.simplex_exact_jac is False
        # With the hatch off, curved simplices use plain 2p.
        assert fop.default_qorder(3, 2, Geom.TET) == 6
    _with_env({"PALACE_TPU_SIMPLEX_EXACT_JAC": "0"}, check)
    _reset()
    fop._env_policy()


def test_qorder_extra_env():
    def check():
        _reset()
        fop._env_policy()
        assert fop.QuadraturePolicy.extra == 2
        assert fop.default_qorder(3, 1, Geom.HEX) == 8
    _with_env({"PALACE_TPU_QORDER_EXTRA": "2"}, check)
    _reset()
    fop._env_policy()
