"""Documentation coverage: every public symbol documented, API pages
fresh.

The reference ships per-package Sphinx API pages
(``/root/reference/docs/rime-api.rst`` etc.) covering every public
function; here ``docs/generate_api.py`` renders the same surface from
live docstrings and this test pins it so pages cannot rot.
"""

import importlib
import inspect
import os
import sys

import pytest

DOCS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs")
sys.path.insert(0, DOCS_DIR)

import generate_api  # noqa: E402


@pytest.mark.parametrize("pkg", sorted(generate_api.PACKAGES))
def test_public_symbols_documented(pkg):
    """Every ``__all__`` symbol carries a substantive docstring."""
    mod = importlib.import_module(f"africanus_tpu.{pkg}")
    symbols = getattr(mod, "__all__", ())
    assert symbols, f"africanus_tpu.{pkg} exports nothing"
    for s in symbols:
        obj = getattr(mod, s)
        doc = inspect.getdoc(obj) or ""
        assert len(doc) >= 60, (
            f"africanus_tpu.{pkg}.{s} is under-documented "
            f"({len(doc)} chars)"
        )


@pytest.mark.parametrize("pkg", sorted(generate_api.PACKAGES))
def test_api_page_fresh(pkg):
    """The generated page exists and matches the live docstrings."""
    path = generate_api.page_path(pkg)
    assert os.path.exists(path), (
        f"missing {path}; run python docs/generate_api.py"
    )
    want = generate_api.render_page(pkg, generate_api.PACKAGES[pkg])
    got = open(path).read()
    assert got == want, (
        f"{path} is stale; run python docs/generate_api.py"
    )


def test_api_index_fresh():
    path = os.path.join(DOCS_DIR, "api", "index.md")
    assert open(path).read() == generate_api.render_index()
