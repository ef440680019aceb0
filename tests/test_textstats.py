import numpy as np

from courlan_ray.functions import textstats as T


def test_detect_language():
    langs, conf = T.detect_language([
        "the quick brown fox jumps over the lazy dog and the cat",
        "der schnelle braune Fuchs springt über den faulen Hund und die Katze",
        "le renard brun saute par dessus le chien paresseux dans la rue",
        "el zorro marrón salta sobre el perro perezoso en la calle",
        "zxqv wkrt plmn",          # gibberish -> undetermined
    ])
    assert list(langs[:4]) == ["en", "de", "fr", "es"]
    assert conf[4] == 0.0 or langs[4] == ""


def test_lang_gate_passes_undetermined():
    ok = T.lang_gate(["zxqv wkrt plmn 123", "the cat and the dog"], "en")
    assert ok.tolist() == [True, True]
    ok2 = T.lang_gate(["der Hund und die Katze sind im Garten"], "en")
    assert ok2.tolist() == [False]


def test_token_counts():
    ws = T.token_counts(["one two  three", "", "a b"], mode="whitespace")
    assert ws.tolist() == [3, 0, 2]
    bp = T.token_counts(["hello world's fun"], mode="bpeish")
    assert bp[0] >= 3


def test_quality_scores_sane():
    q = T.quality_scores([
        "The river flows through the old town and the bridge is busy.",
        "$$$ !!! ### @@@ %%% ^^^ &&& *** ((( )))",
        "aaa aaa aaa aaa aaa aaa aaa aaa",
    ])
    assert q["quality"][0] > q["quality"][1]
    assert q["unique_ratio"][2] < 0.3
    assert 0 <= q["quality"].min() and q["quality"].max() <= 1


def test_doc_repetition_kernel(ray_session, tmp_path):
    """Hand-computed top-token repetition: ties break to the smaller
    token, empty/no-token docs give ('', 0.0)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from courlan_ray.pipelines.extras import doc_repetition

    sf = tmp_path / "sfx"
    sf.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["spam spam ham", "b a b a", "", "123 456 !!!"],
    }), sf / "documents.parquet")
    got = doc_repetition(str(sf)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got["n_tokens"].tolist() == [3, 4, 0, 0]
    assert got["top_token"].tolist() == ["spam", "a", "", ""]   # tie: a < b
    assert got["top_frac"].tolist() == [0.6667, 0.5, 0.0, 0.0]
    # bigrams: ["spam spam","spam ham"], ["b a","a b","b a"], [], []
    assert got["n_bigrams"].tolist() == [2, 3, 0, 0]
    assert got["dup_bigram_frac"].tolist() == [0.0, 0.3333, 0.0, 0.0]
