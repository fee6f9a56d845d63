"""nvtext ops + aux subsystems (spill, tracing, config, native)."""

import numpy as np
import pytest

import cudf_tpu as ct
from cudf_tpu.core.column import Column
from cudf_tpu.ops import text


def test_count_tokens():
    s = Column.from_strings(["hello world foo", "  a  b ", None, "single", ""])
    assert text.count_tokens(s).to_pylist() == [3, 2, None, 1, 0]


def test_tokenize():
    s = Column.from_strings(["a b", "c"])
    assert text.tokenize(s).to_pylist() == ["a", "b", "c"]


def test_character_ngrams():
    out = text.character_ngrams(Column.from_strings(["abcd", "xy"]), 2)
    assert out.to_pylist() == [["ab", "bc", "cd"], ["xy"]]


def test_normalize_spaces():
    s = Column.from_strings(["  a   b  ", "c"])
    assert text.normalize_spaces(s).to_pylist() == ["a b", "c"]


def test_edit_distance():
    a = Column.from_strings(["kitten"])
    b = Column.from_strings(["sitting"])
    assert text.edit_distance(a, b).to_pylist() == [3]


def test_minhash_similarity():
    import jax.numpy as jnp

    col = Column.from_strings(["the quick brown fox", "the quick brown fox", "zzz yyy"])
    mh = text.minhash(col, jnp.asarray([1, 2, 3], dtype=jnp.uint64))
    v = mh.to_pylist()
    assert v[0] == v[1]
    assert v[0] != v[2]


def test_spill_roundtrip():
    from cudf_tpu.utils.spill import get_spill_manager, spill, unspill

    df = ct.DataFrame({"a": np.arange(100), "s": ["x"] * 100})
    freed = spill(df)
    assert freed > 0
    unspill(df)
    assert df["a"].sum() == 4950


def test_spill_to_budget():
    from cudf_tpu.utils.spill import SpillManager

    mgr = SpillManager()
    cols = [Column.from_numpy(np.arange(1000)) for _ in range(4)]
    for c in cols:
        mgr.register(c)
    freed = mgr.spill_to_budget(2 * 8000)
    assert freed >= 2 * 8000


def test_tracer():
    from cudf_tpu.utils.tracing import enable_tracing, tracer

    with enable_tracing():
        with tracer.range("op_x"):
            pass
    assert "op_x" in tracer.summary()
    tracer.clear()


def test_config_env_and_context():
    from cudf_tpu.utils.config import get_option, option_context, set_option

    assert get_option("mode.pandas_compatible") is True
    with option_context("display.max_rows", 5):
        assert get_option("display.max_rows") == 5
    with pytest.raises(ValueError):
        set_option("display.max_rows", -1)


def test_tokenize_with_vocabulary():
    from cudf_tpu.ops import text as text_ops

    c = Column.from_strings(["the quick fox", "fox jumps", None, "unknown words"])
    vocab = Column.from_strings(["fox", "jumps", "quick", "the"])
    out = text_ops.tokenize_with_vocabulary(c, vocab)
    assert out.to_pylist() == [[3, 2, 0], [0, 1], None, [-1, -1]]


def test_wordpiece_tokenize():
    from cudf_tpu.ops import text as text_ops

    vocab = {"[UNK]": 0, "un": 1, "##aff": 2, "##able": 3, "hello": 4, "##b": 5}
    c = Column.from_strings(["hello unaffable", "xyz", None])
    out = text_ops.wordpiece_tokenize(c, vocab)
    assert out.to_pylist() == [[4, 1, 2, 3], [0], None]


def test_byte_pair_encoding():
    from cudf_tpu.ops import text as text_ops

    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o")]
    c = Column.from_strings(["hello hell", None])
    out = text_ops.byte_pair_encoding(c, merges)
    assert out.to_pylist() == ["hello hell", None]
    out2 = text_ops.byte_pair_encoding(Column.from_strings(["help"]), merges)
    assert out2.to_pylist() == ["he l p"]
