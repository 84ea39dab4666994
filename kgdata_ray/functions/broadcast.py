"""Broadcast-object plumbing for task-based map stages.

``ray.put`` once on the driver; inside map tasks, :func:`get_broadcast`
fetches the object from the local object store and caches the
deserialized value in the worker process (workers are long-lived and
reused, so each pays the deserialization once). This gives
broadcast-join/filter stages the latency profile of plain fused tasks
— no actor-pool spin-up — while keeping a single copy of the object in
shared memory per node.

Use an actor pool instead (class + ``fn_constructor_args``) only when
per-worker state is expensive to BUILD, not merely to fetch.
"""

from __future__ import annotations

from typing import Any, Union

import ray

_CACHE: dict = {}


def as_ref(obj: Any) -> "ray.ObjectRef":
    return obj if isinstance(obj, ray.ObjectRef) else ray.put(obj)


def get_broadcast(ref: Union["ray.ObjectRef", Any]) -> Any:
    """Resolve a broadcast ref with worker-process caching; passes
    non-refs through unchanged."""
    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key not in _CACHE:
        if len(_CACHE) > 16:
            _CACHE.clear()
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
