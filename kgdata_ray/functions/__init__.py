"""Engine primitives: the Ray-Data re-expression of the reference's
``ExtendedRDD`` operator surface (``kgdata/spark/extended_rdd.py:185-696``)
— joins, grouped aggregates, top-k, dedup, hashing/checksums, text
normalization kernels."""
