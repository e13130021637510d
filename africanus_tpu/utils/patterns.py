"""Resource patterns: freeze, Multiton, LazyProxy.

Equivalents of reference ``africanus/util/patterns.py`` (freeze:13,
Multiton:29, LazyProxy:126, LazyProxyMultiton:391). LazyProxy lets
heavy-weight resources (file handles, pools) be embedded as lightweight
picklable references and instantiated on first attribute access — useful
for shipping beam-file handles into sharded/host-callback pipelines.
"""

from __future__ import annotations

import inspect
import weakref
from collections import OrderedDict
from threading import Lock
from warnings import warn

import numpy as np

__all__ = ["freeze", "Multiton", "LazyProxy", "LazyProxyMultiton"]


def freeze(arg):
    """Recursively build a hashable key from arg."""
    if isinstance(arg, set):
        return tuple(map(freeze, sorted(arg)))
    if isinstance(arg, (tuple, list)):
        return tuple(map(freeze, arg))
    if isinstance(arg, (dict, OrderedDict)):
        return frozenset((freeze(k), freeze(v)) for k, v in sorted(arg.items()))
    if isinstance(arg, np.ndarray):
        if arg.nbytes > 10:
            warn(f"freezing ndarray of size {arg.nbytes} is probably inefficient")
        return freeze(arg.tolist())
    return arg


class Multiton(type):
    """Metaclass returning a unique instance per unique constructor args.

    Instantiation is thread-safe (double-checked locking); instances are
    weakly cached so they die with their last reference.
    """

    MISSING = object()

    def __init__(cls, *args, **kwargs):
        super().__init__(*args, **kwargs)
        cls._multiton_cache = weakref.WeakValueDictionary()
        cls._multiton_lock = Lock()

    def __call__(cls, *args, **kwargs):
        sig = inspect.signature(cls.__init__)
        pos_in_kw = [
            p.name
            for p in sig.parameters.values()
            if p.kind == p.POSITIONAL_OR_KEYWORD
            and p.default is p.empty
            and p.name in kwargs
        ]
        if pos_in_kw:
            warn(
                f"Positional arguments {pos_in_kw} were supplied as keyword "
                f"arguments to {cls.__init__}{sig}. This may create separate "
                f"Multiton instances for what is intended to be a unique "
                f"set of arguments."
            )

        key = freeze(args + (kwargs if kwargs else Multiton.MISSING,))
        try:
            return cls._multiton_cache[key]
        except KeyError:
            pass
        with cls._multiton_lock:
            try:
                return cls._multiton_cache[key]
            except KeyError:
                instance = type.__call__(cls, *args, **kwargs)
                cls._multiton_cache[key] = instance
                return instance


class LazyProxy:
    """Proxy that instantiates its target on first attribute access.

    ``LazyProxy(open, "f.txt", mode="r")`` behaves like the opened file but
    pickles as just (factory, args); ``LazyProxy((open, finaliser), ...)``
    additionally registers a weakref finaliser for cleanup.
    """

    __lazy_members__ = frozenset(
        (
            "__lazy_fn__",
            "__lazy_finaliser__",
            "__lazy_args__",
            "__lazy_kwargs__",
            "__lazy_object__",
            "__lazy_lock__",
        )
    )

    def __init__(self, fn, *args, **kwargs):
        ex = ValueError(
            "fn must be a callable or a tuple of two callables: "
            "(factory, finaliser)"
        )
        if isinstance(fn, tuple):
            if len(fn) != 2 or not all(callable(f) for f in fn):
                raise ex
            factory, finaliser = fn
        elif callable(fn):
            factory, finaliser = fn, None
        else:
            raise ex

        object.__setattr__(self, "__lazy_fn__", factory)
        object.__setattr__(self, "__lazy_finaliser__", finaliser)
        object.__setattr__(self, "__lazy_args__", args)
        object.__setattr__(self, "__lazy_kwargs__", kwargs)
        object.__setattr__(self, "__lazy_lock__", Lock())

    def __lazy_resolve__(self):
        try:
            return object.__getattribute__(self, "__lazy_object__")
        except AttributeError:
            pass
        with object.__getattribute__(self, "__lazy_lock__"):
            try:
                return object.__getattribute__(self, "__lazy_object__")
            except AttributeError:
                factory = object.__getattribute__(self, "__lazy_fn__")
                args = object.__getattribute__(self, "__lazy_args__")
                kwargs = object.__getattribute__(self, "__lazy_kwargs__")
                obj = factory(*args, **kwargs)
                object.__setattr__(self, "__lazy_object__", obj)
                finaliser = object.__getattribute__(self, "__lazy_finaliser__")
                if finaliser is not None:
                    weakref.finalize(self, finaliser, obj)
                return obj

    def __getattr__(self, name):
        if name in LazyProxy.__lazy_members__ or name == "__lazy_resolve__":
            return object.__getattribute__(self, name)
        return getattr(self.__lazy_resolve__(), name)

    def __setattr__(self, name, value):
        if name in LazyProxy.__lazy_members__:
            object.__setattr__(self, name, value)
        else:
            setattr(self.__lazy_resolve__(), name, value)

    def __call__(self, *args, **kwargs):
        return self.__lazy_resolve__()(*args, **kwargs)

    def __reduce__(self):
        finaliser = object.__getattribute__(self, "__lazy_finaliser__")
        factory = object.__getattribute__(self, "__lazy_fn__")
        fn = (factory, finaliser) if finaliser is not None else factory
        args = object.__getattribute__(self, "__lazy_args__")
        kwargs = object.__getattribute__(self, "__lazy_kwargs__")
        return (_rebuild_lazy_proxy, (type(self), fn, args, kwargs))


def _rebuild_lazy_proxy(cls, fn, args, kwargs):
    return cls(fn, *args, **kwargs)


class LazyProxyMultiton(LazyProxy, metaclass=Multiton):
    """LazyProxy whose unique (factory, args) yields a unique instance."""
