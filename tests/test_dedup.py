

def test_line_dedup_hand_case_and_partition_invariance(ray_session):
    """CCNet/RefinedWeb line dedup: duplicated pseudo-lines removed from
    EVERY doc (order-free rule), docs reassembled in position order;
    identical results under any block layout."""
    import hashlib

    import ray.data as rd

    from lucene_ray.ops.dedup import LINE_W, line_dedup

    shared = " ".join(f"w{i}" for i in range(LINE_W))  # one full dup line
    docs = [
        {"doc_id": 0, "text": f"{shared} alpha beta gamma"},
        {"doc_id": 1, "text": f"{shared} delta epsilon"},
        {"doc_id": 2, "text": "unique words only here"},
    ]
    out = (
        line_dedup(rd.from_items(docs, override_num_blocks=3))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # the shared 8-token line is dropped from BOTH docs 0 and 1
    assert out.loc[0, "dropped"] == 1 and out.loc[0, "kept"] == 1
    assert out.loc[1, "dropped"] == 1 and out.loc[1, "kept"] == 1
    assert out.loc[2, "dropped"] == 0 and out.loc[2, "kept"] == 1
    assert out.loc[0, "digest"] == hashlib.md5(b"alpha beta gamma").hexdigest()
    assert out.loc[2, "digest"] == hashlib.md5(b"unique words only here").hexdigest()
    # partition invariance: 1 block == 3 blocks
    one = (
        line_dedup(rd.from_items(docs, override_num_blocks=1))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert one.equals(out.reset_index())
