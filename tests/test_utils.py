"""Utility module tests (reference: africanus/util/*)."""

import pickle

import numpy as np
from numpy.testing import assert_allclose
import pytest

from africanus_tpu.utils import (
    DocstringTemplate,
    aggregate_chunks,
    corr_shape,
    parse_python_assigns,
    freeze,
    Multiton,
    LazyProxy,
    format_code,
    memoize_on_key,
    requires_optional,
    MissingPackageException,
)


def test_docstring_template():
    t = DocstringTemplate("array of $(array_type) values")
    assert t.substitute(array_type="jax.Array") == "array of jax.Array values"


def test_aggregate_chunks():
    chunks, max_c = ((3, 4, 6, 3, 6, 7), (1, 1, 1, 1, 1, 1)), (10, 3)
    assert aggregate_chunks(chunks, max_c) == ((7, 9, 6, 7), (2, 2, 1, 1))
    assert aggregate_chunks((3, 4, 6, 3), 10) == (7, 9)


def test_corr_shape():
    assert corr_shape(4, "flat") == (4,)
    assert corr_shape(4, "matrix") == (2, 2)
    assert corr_shape(2, "matrix") == (2,)
    assert corr_shape(1, "matrix") == (1,)
    with pytest.raises(ValueError):
        corr_shape(3, "matrix")


def test_parse_python_assigns():
    data = parse_python_assigns("beta=5.6; l=[2,3]; s='hello, world'")
    assert data == {"beta": 5.6, "l": [2, 3], "s": "hello, world"}
    assert parse_python_assigns("sl=slice(0, 10)") == {"sl": slice(0, 10)}
    assert parse_python_assigns("a, b = (1, 2)") == {"a": 1, "b": 2}
    assert parse_python_assigns("") == {}
    with pytest.raises(ValueError, match="not builtin"):
        parse_python_assigns("x=eval('1')")
    with pytest.raises(ValueError, match="not a variable assignment"):
        parse_python_assigns("1 + 1")


def test_freeze_and_multiton():
    assert freeze([1, {"a": [2, 3]}]) == (1, frozenset({("a", (2, 3))}))

    class A(metaclass=Multiton):
        def __init__(self, *args, **kw):
            self.args = args

    assert A(1) is A(1)
    assert A(1, "bob") is not A(1)


def test_lazy_proxy(tmp_path):
    calls = []

    def factory(x):
        calls.append(x)
        return {"value": x}

    p = LazyProxy(factory, 42)
    assert calls == []  # not yet instantiated
    assert p["value"] if False else p.__lazy_resolve__()["value"] == 42
    assert calls == [42]

    # pickling does not instantiate the resource
    p2 = LazyProxy(open, tmp_path / "f.txt", mode="w")
    blob = pickle.dumps(p2)
    p3 = pickle.loads(blob)
    p3.write("hello")
    p3.close()
    assert (tmp_path / "f.txt").read_text() == "hello"


def test_format_code_and_memoize():
    assert format_code("a\nb").splitlines()[0].endswith("a")

    ncalls = []

    @memoize_on_key(lambda x: x)
    def fn(x):
        ncalls.append(x)
        return x * 2

    assert fn(2) == 4 and fn(2) == 4
    assert ncalls == [2]


def test_requires_optional():
    @requires_optional("numpy")
    def fine():
        return 42

    assert fine() == 42

    @requires_optional("no_such_package_xyz")
    def broken():
        return 42

    with pytest.raises(MissingPackageException):
        broken()

    err = ImportError("boom")

    @requires_optional("numpy", err)
    def broken2():
        return 1

    with pytest.raises(ImportError, match="boom"):
        broken2()


def test_sha_hash_file(tmp_path):
    from africanus_tpu.utils.files import sha_hash_file, user_data_dir

    p = tmp_path / "blob.bin"
    p.write_bytes(b"hello world")
    import hashlib
    assert sha_hash_file(str(p)) == hashlib.sha1(b"hello world").hexdigest()
    assert "africanus-tpu" in user_data_dir


def test_jax_init_import():
    import africanus_tpu.utils.jax_init  # noqa: F401
    import jax

    # on the CPU test backend x64 must be active
    assert jax.config.jax_enable_x64


def test_profiling_measure_and_roofline():
    import jax.numpy as jnp
    from africanus_tpu.utils.profiling import measure, roofline

    x = jnp.arange(4096, dtype=jnp.float32)
    dt = measure(lambda v: v * 2.0 + 1.0, x, reps=3)
    assert dt > 0

    r = roofline(seconds=1e-3, flops=1e9, bytes=1e6)
    assert r.intensity == 1000.0
    assert 0 < r.fraction <= 1.0 or r.achieved > 0
    assert "TFLOP/s" in str(r)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from africanus_tpu.ops.cplx import Cplx
    from africanus_tpu.utils.checkpoint import restore, save

    tree = {"phases": jnp.arange(6.0).reshape(2, 3),
            "g": Cplx(jnp.ones((2, 2)), jnp.zeros((2, 2))), "k": jnp.int32(7)}
    path = tmp_path / "ckpt"
    save(path, tree)
    back = restore(path, like=tree)
    assert np.allclose(np.asarray(back["phases"]), np.arange(6.0).reshape(2, 3))
    assert isinstance(back["g"], Cplx)
    assert int(back["k"]) == 7


def test_checkpoint_loop_resumes(tmp_path):
    import jax.numpy as jnp
    from africanus_tpu.utils.checkpoint import CheckpointLoop

    d = tmp_path / "loop"
    loop = CheckpointLoop(d, {"x": jnp.float64(0.0)}, every=2)
    for step, state in loop.range(5):
        loop.state = {"x": state["x"] + 1.0}
        if step == 3:
            break  # crash mid-step: last durable save was after step 1
    # new driver resumes from the last saved step
    loop2 = CheckpointLoop(d, {"x": jnp.float64(0.0)}, every=2)
    assert loop2.start == 2
    assert float(loop2.state["x"]) == 2.0
    for step, state in loop2.range(6):
        loop2.state = {"x": state["x"] + 1.0}
    assert float(loop2.state["x"]) == 6.0
