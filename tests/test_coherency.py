"""Stokes ↔ correlation conversion tests (reference semantics:
model/coherency/conversion.py STOKES_TO_CORR_CONV/CORR_TO_STOKES_CONV)."""

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.model.coherency import convert
from africanus_tpu.model.coherency.conversion import MissingConversionInputs


@pytest.fixture
def stokes(rng):
    return rng.normal(size=(10, 4))  # I, Q, U, V


def test_stokes_to_linear_and_back(stokes):
    corr = np.asarray(convert(stokes, ["I", "Q", "U", "V"], ["XX", "XY", "YX", "YY"]))
    I, Q, U, V = stokes.T  # noqa: E741
    assert np.iscomplexobj(corr)
    assert_allclose(corr[:, 0], I + Q)
    assert_allclose(corr[:, 1], U + 1j * V)
    assert_allclose(corr[:, 2], U - 1j * V)
    assert_allclose(corr[:, 3], I - Q)

    back = np.asarray(convert(corr, ["XX", "XY", "YX", "YY"], ["I", "Q", "U", "V"]))
    assert_allclose(back.real, stokes, atol=1e-12)
    assert_allclose(back.imag, 0.0, atol=1e-12)


def test_stokes_to_circular_and_back(stokes):
    corr = np.asarray(convert(stokes, ["I", "Q", "U", "V"], ["RR", "RL", "LR", "LL"]))
    I, Q, U, V = stokes.T  # noqa: E741
    assert_allclose(corr[:, 0], I + V)
    assert_allclose(corr[:, 1], Q + 1j * U)
    assert_allclose(corr[:, 2], Q - 1j * U)
    assert_allclose(corr[:, 3], I - V)

    back = np.asarray(convert(corr, ["RR", "RL", "LR", "LL"], ["I", "Q", "U", "V"]))
    assert_allclose(back.real, stokes, atol=1e-12)


def test_nested_schema(stokes):
    flat = np.asarray(convert(stokes, ["I", "Q", "U", "V"], ["XX", "XY", "YX", "YY"]))
    nested = np.asarray(
        convert(stokes, ["I", "Q", "U", "V"], [["XX", "XY"], ["YX", "YY"]])
    )
    assert nested.shape == (10, 2, 2)
    assert_allclose(nested.reshape(10, 4), flat)


def test_casa_integer_ids(stokes):
    # 9..12 are XX, XY, YX, YY in the CASA enumeration
    corr = np.asarray(convert(stokes, ["I", "Q", "U", "V"], [9, 10, 11, 12]))
    named = np.asarray(convert(stokes, ["I", "Q", "U", "V"], ["XX", "XY", "YX", "YY"]))
    assert_allclose(corr, named)


def test_implicit_stokes(rng):
    I = rng.normal(size=(7,))  # noqa: E741
    corr = np.asarray(convert(I[:, None], ["I"], ["XX", "XY", "YX", "YY"], True))
    assert_allclose(corr[:, 0], I)
    assert_allclose(corr[:, 1], 0.0)
    assert_allclose(corr[:, 2], 0.0)
    assert_allclose(corr[:, 3], I)

    with pytest.raises(MissingConversionInputs):
        convert(I[:, None], ["I"], ["XX", "XY", "YX", "YY"])


def test_unknown_output(stokes):
    with pytest.raises(ValueError, match="Unknown output"):
        convert(stokes, ["I", "Q", "U", "V"], ["ZZ"])


# The reference's full schema sweep (model/coherency/tests/test_convert.py
# stokes_corr_cases) — every linear/circular, flat/nested, forward/inverse
# combination, plus the CASA-integer-id variant.
_SCHEMA_CASES = [
    ([["XX"], ["YY"]], ["I", "Q"]),
    (["XX", "YY"], ["I", "Q"]),
    (["XX", "XY", "YX", "YY"], ["I", "Q", "U", "V"]),
    ([["XX", "XY"], ["YX", "YY"]], [["I", "Q"], ["U", "V"]]),
    (["I", "Q", "U", "V"], ["XX", "XY", "YX", "YY"]),
    ([["I", "Q"], ["U", "V"]], [["XX", "XY"], ["YX", "YY"]]),
    ([["I", "Q"], ["U", "V"]], [["XX", "XY", "YX", "YY"]]),
    ([["I", "Q"], ["U", "V"]], [["RR", "RL", "LR", "LL"]]),
    (["I", "V"], ["RR", "LL"]),
    (["I", "Q"], ["XX", "YY"]),
    ([9, 12], [1, 2]),  # CASA ids: XX,YY -> I,Q
]


def _flatten_schema(s):
    out = []
    for e in s:
        out.extend(_flatten_schema(e) if isinstance(e, list) else [e])
    return out


@pytest.mark.parametrize("input_schema,output_schema", _SCHEMA_CASES)
@pytest.mark.parametrize("vis_shape", [(10, 5, 3), (6, 8)])
def test_convert_schema_sweep(input_schema, output_schema, vis_shape):
    """Round-trip sweep: convert forward then back through the inverse
    schema recovers the input (the linear maps are inverse pairs), with
    the reference's arange-valued visibility factory."""
    # nested schemas imply trailing dims matching their structure
    def schema_shape(s):
        if isinstance(s, list) and s and isinstance(s[0], list):
            return (len(s), len(s[0]))
        return (len(s),)

    ishape = schema_shape(input_schema)
    vis = np.arange(1.0, np.prod(vis_shape + ishape) + 1.0).reshape(
        vis_shape + ishape
    )

    out = np.asarray(convert(vis, input_schema, output_schema))
    assert out.shape == vis_shape + schema_shape(output_schema)

    # invert: output schema back to input schema
    back = np.asarray(convert(out, output_schema, input_schema))
    assert_allclose(back.reshape(vis.shape), vis, rtol=1e-12, atol=1e-12)
