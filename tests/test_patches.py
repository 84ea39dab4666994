from __future__ import annotations

import pyarrow as pa

from kgdata_ray.functions.modifications import apply_gazetteer_patches
from kgdata_ray.oracle import build_alias_index
from kgdata_ray.synth import SynthConfig, gazetteer_table


def test_gazetteer_patches_change_linking():
    cfg = SynthConfig(n_convs=10, n_entities=40)
    gz = gazetteer_table(cfg)
    patches = pa.table(
        {
            "op": ["add", "set_freq", "remove"],
            "entity_id": ["E0000002", "E0000001", "E0000000"],
            "alias": ["The Famous Org", gz.column("alias")[1].as_py(),
                      gz.column("alias")[-1].as_py()],
            "freq_global": [999_999, 5, None],
        }
    )
    # remove patch must target a row belonging to E0000000: craft one
    e0_alias = None
    for r in gz.to_pylist():
        if r["entity_id"] == "E0000000":
            e0_alias = r["alias"]
            break
    patches = pa.table(
        {
            "op": ["add", "remove"],
            "entity_id": ["E0000002", "E0000000"],
            "alias": ["The Famous Org", e0_alias],
            "freq_global": [999_999, None],
        }
    )
    patched = apply_gazetteer_patches(gz, patches)
    assert patched.num_rows == gz.num_rows  # +1 add, -1 remove

    idx = build_alias_index(patched)
    assert idx["the famous org"] == "E0000002"
    # removed alias no longer resolves to E0000000
    from kgdata_ray.functions.text import normalize_mention

    assert idx.get(normalize_mention(e0_alias)) != "E0000000"
