"""jit helpers for field/curve kind methods.

Field kinds are static singletons; ``jit_method`` caches one jitted
closure per (instance, method) so heavy entry points (sqrt, inverse,
scalar-mul, ...) compile once and run compiled even when called eagerly.
Nested use inside an outer jit simply inlines.
"""

from __future__ import annotations

import functools

import jax


def jit_method(fn):
    """Decorator: jit an instance method with ``self`` closed over.

    Positional args must be jax types (pytrees of arrays).  Keyword args
    are treated as static (part of the cache key).
    """

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        cache = self.__dict__.setdefault("_jit_cache", {})
        key = (fn.__name__, tuple(sorted(kwargs.items())))
        if key not in cache:
            cache[key] = jax.jit(lambda *a: fn(self, *a, **kwargs))
        return cache[key](*args)

    wrapper.__wrapped__ = fn
    return wrapper
