"""Pipeline stages: each module exposes functions taking and returning
``ray.data.Dataset`` (lazy; the caller owns execution)."""
