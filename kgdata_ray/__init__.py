"""kgdata_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch rebuild of the query / KG-construction capabilities of
binh-vu/kgdata (studied at /root/reference) over Parquet tables of
multi-turn conversation transcripts, expressed as ray.data.Dataset
pipelines of zero-copy Arrow ``map_batches`` stages with actor pools
for stateful steps.

Layout:
  - ``synth``      deterministic synthetic transcript / gazetteer / redirect
                   generator (FIXTURES.md F1-F3)
  - ``oracle``     pure-Python single-process reference extractor (F4)
  - ``stages``     pipeline stages: reconstruct, mentions, extract, linking,
                   canonicalize, dedup, textstats, similarity, multimodal
  - ``functions``  engine primitives: joins (broadcast / salted / anti / FK),
                   grouped aggregates, top-k, hashing / checksums
  - ``state``      lineage manifests + checkpoint-resume
  - ``pipelines``  end-to-end flagship KG pipeline + driver-contract queries

No module here calls ``ray.init()`` — sessions are owned by the caller
(bench.py, CLI, or the test fixture).
"""

__version__ = "0.1.0"
