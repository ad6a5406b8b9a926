"""Native hostkit (C++ tokenizer/pair-shaper) parity and fallback.

The contract: for ASCII inputs, native/hostkit.cpp produces byte-identical
(ids, mask) arrays to the pure-Python ``_batch_encode`` over
``SimpleTokenizer`` — including the BLAKE2b(digest_size=8) stable hash ids
(hostkit.cpp implements RFC 7693 from scratch) and the cross-encoder pair
budget split. Non-ASCII input and missing-toolchain environments must fall
back to the Python path transparently.
"""

import hashlib
import random
import string

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tensortruth_tpu.native import get_hostkit
from tensortruth_tpu.tokenization.tokenizer import SimpleTokenizer, _batch_encode

pytestmark = pytest.mark.unit

kit = get_hostkit()
needs_kit = pytest.mark.skipif(kit is None, reason="no C++ toolchain")

TOK = SimpleTokenizer()


def _native(texts, L, pair=None):
    return kit.encode_batch(
        texts, L, pair=pair, vocab_size=TOK.vocab_size, pad_id=TOK.pad_id,
        cls_id=TOK.cls_id, sep_id=TOK.sep_id, n_special=TOK.n_special,
    )


@needs_kit
def test_blake2b_token_id_parity():
    """The C++ BLAKE2b must match hashlib for the exact parameterization
    the tokenizer uses (digest_size=8, little-endian u64)."""
    cases = ["a", "hello", "WORLD", "_", "9mm", "x" * 127, "y" * 128,
             "z" * 129, "q" * 513, "mixedCase_Token42"]
    for t in cases:
        expect = TOK._token_id(t)
        got = kit.token_id(t, TOK.vocab_size, TOK.n_special)
        assert got == expect, t
        # cross-check against hashlib directly (guards both implementations)
        h = hashlib.blake2b(t.lower().encode(), digest_size=8).digest()
        manual = TOK.n_special + int.from_bytes(h, "little") % (
            TOK.vocab_size - TOK.n_special
        )
        assert got == manual


@needs_kit
@pytest.mark.parametrize("max_length", [8, 16, 64, 128, 256])
def test_batch_parity_random_ascii(max_length):
    rng = random.Random(max_length)
    alphabet = (string.ascii_letters + string.digits +
                " _.,;:!?()[]{}<>#$%&*+-/=@\\^`|~'\"\t\n")
    def rand_text(n):
        return "".join(rng.choice(alphabet) for _ in range(n))

    texts = [rand_text(rng.randrange(0, 300)) for _ in range(32)]
    pairs = [rand_text(rng.randrange(0, 900)) for _ in range(32)]

    ids_py, mask_py = _batch_encode(TOK, texts, max_length, None)
    ids_cc, mask_cc = _native(texts, max_length)
    assert np.array_equal(ids_py, ids_cc)
    assert np.array_equal(mask_py, mask_cc)

    ids_py, mask_py = _batch_encode(TOK, texts, max_length, pairs)
    ids_cc, mask_cc = _native(texts, max_length, pair=pairs)
    assert np.array_equal(ids_py, ids_cc)
    assert np.array_equal(mask_py, mask_cc)


@needs_kit
def test_batch_parity_edge_inputs():
    """Empty strings, whitespace-only, punctuation runs, single chars, and
    the repeated-query memoization pattern of rerank batches."""
    texts = ["", "   ", "\t\n", "...", "a", "word", "a b", "__", "-"]
    ids_py, mask_py = _batch_encode(TOK, texts, 16, None)
    ids_cc, mask_cc = _native(texts, 16)
    assert np.array_equal(ids_py, ids_cc) and np.array_equal(mask_py, mask_cc)

    q = "the same query repeated"
    texts = [q] * 10
    docs = [f"doc {i} body text" for i in range(10)]
    ids_py, mask_py = _batch_encode(TOK, texts, 32, docs)
    ids_cc, mask_cc = _native(texts, 32, pair=docs)
    assert np.array_equal(ids_py, ids_cc) and np.array_equal(mask_py, mask_cc)


@needs_kit
def test_pair_budget_split_favors_short_query():
    """A short query leaves its unused budget to the doc (the min() in the
    a_budget formula) — the exact behavior the serving path depends on to
    avoid clipping doc chunks."""
    L = 64
    short_q = "tiny query"
    long_doc = " ".join(f"tok{i}" for i in range(200))
    ids, mask = _native([short_q], L, pair=[long_doc])
    n_q = len(TOK.encode(short_q))
    # layout: cls + q + sep sep + doc... + sep, total exactly L
    assert int(mask.sum()) == L
    assert ids[0, 0] == TOK.cls_id
    assert ids[0, 1 + n_q] == TOK.sep_id and ids[0, 2 + n_q] == TOK.sep_id
    assert ids[0, L - 1] == TOK.sep_id


@needs_kit
def test_bmp_unicode_handled_natively():
    """Real-world non-ASCII text (accents, em-dashes, CJK, Cyrillic) is
    handled natively with exact parity — this is most of what real corpora
    contain; the pre-Unicode kit bounced ALL of it to Python."""
    texts = ["héllo wörld", "em—dash and “curly quotes”", "naïve café",
             "русский текст", "中文 分词 测试", "Straße GRÜSSE İstanbul"]
    ids_py, mask_py = _batch_encode(TOK, texts, 32, None)
    out = _native(texts, 32)
    assert out is not None
    assert np.array_equal(ids_py, out[0]) and np.array_equal(mask_py, out[1])
    pairs = ["doc ünö", "—", "ß", "документ", "文档", "İİ"]
    ids_py, mask_py = _batch_encode(TOK, texts, 32, pairs)
    out = _native(texts, 32, pair=pairs)
    assert out is not None
    assert np.array_equal(ids_py, out[0]) and np.array_equal(mask_py, out[1])


@needs_kit
def test_fallback_astral_and_sigma():
    """The three cases the BMP tables cannot answer bounce to Python:
    astral-plane chars (emoji), U+03A3 (context-sensitive lowercase), and
    embedded NULs — and the dispatch output still equals the reference."""
    assert _native(["rocket 🚀"], 16) is None
    assert _native(["ΑΣ ends in sigma"], 16) is None
    assert _native(["ok"], 16, pair=["emoji 😀"]) is None
    for text in ["rocket 🚀 launch", "ΤΟ ΤΕΛΟΣ"]:
        ids_a, mask_a = TOK.encode_batch([text], 24)
        ids_b, mask_b = _batch_encode(TOK, [text], 24, None)
        assert np.array_equal(ids_a, ids_b) and np.array_equal(mask_a, mask_b)


@needs_kit
def test_embedded_nul_returns_none():
    """ASCII-encodable but NUL-bearing text must take the Python path:
    c_char_p would truncate at the NUL and silently tokenize a prefix
    (utils/pdf.py's COS fallback can emit \\x00 via octal escapes)."""
    assert _native(["before\x00after"], 16) is None
    assert _native(["ok"], 16, pair=["a\x00b"]) is None
    # dispatch end-to-end: identical to the pure-Python reference
    texts = ["pre\x00post token"]
    ids_a, mask_a = TOK.encode_batch(texts, 16)
    ids_b, mask_b = _batch_encode(TOK, texts, 16, None)
    assert np.array_equal(ids_a, ids_b) and np.array_equal(mask_a, mask_b)


@needs_kit
@pytest.mark.parametrize("max_length", [0, 1, 2, 3, 4, 5, 6])
def test_tiny_max_length_parity(max_length):
    """Rows narrower than the special-token skeleton: Python truncates the
    built seq (including negative-stop slices like a[:max_length-2]); the
    native path must match without writing past the row (regression: the
    pre-fix code memcpy'd with a negative size at max_length<2 and wrote
    4 skeleton slots into 3-wide pair rows)."""
    texts = ["alpha beta gamma delta", "", "x"]
    pairs = ["one two three four five six", "y", ""]
    ids_py, mask_py = _batch_encode(TOK, texts, max_length, None)
    out = _native(texts, max_length)
    assert out is not None
    assert np.array_equal(ids_py, out[0]) and np.array_equal(mask_py, out[1])
    ids_py, mask_py = _batch_encode(TOK, texts, max_length, pairs)
    out = _native(texts, max_length, pair=pairs)
    assert out is not None
    assert np.array_equal(ids_py, out[0]) and np.array_equal(mask_py, out[1])


def test_simple_tokenizer_dispatch_matches_reference_python():
    """SimpleTokenizer.encode_batch (whatever path it takes) must equal the
    pure-Python reference — on ASCII and on non-ASCII (where the native
    path must bow out, not mangle)."""
    texts = ["plain ascii text", "unicode départ — em-dash"]
    for pair in (None, ["doc one", "doc tw—o"]):
        ids_a, mask_a = TOK.encode_batch(texts, 32, pair=pair)
        ids_b, mask_b = _batch_encode(TOK, texts, 32, pair)
        assert np.array_equal(ids_a, ids_b)
        assert np.array_equal(mask_a, mask_b)


def test_no_native_env_disables(monkeypatch):
    """TENSOR_TRUTH_TPU_NO_NATIVE opts out; encode_batch still works."""
    import tensortruth_tpu.native.hostkit as hk
    monkeypatch.setenv("TENSOR_TRUTH_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(hk, "_HOSTKIT", None)
    monkeypatch.setattr(hk, "_TRIED", False)
    assert hk.get_hostkit() is None
    ids, mask = TOK.encode_batch(["still works"], 8)
    assert ids.shape == (1, 8)
    monkeypatch.setattr(hk, "_TRIED", False)  # let other tests rebuild


ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=0x09, max_codepoint=0x7E),
    max_size=600,
)


@needs_kit
@given(texts=st.lists(ASCII_TEXT, min_size=1, max_size=8),
       max_length=st.integers(0, 300))
@settings(max_examples=120, deadline=None)
def test_property_parity_single(texts, max_length):
    ids_py, mask_py = _batch_encode(TOK, texts, max_length, None)
    out = _native(texts, max_length)
    assert out is not None
    assert np.array_equal(ids_py, out[0]) and np.array_equal(mask_py, out[1])


@needs_kit
@given(data=st.data(), max_length=st.integers(0, 300))
@settings(max_examples=120, deadline=None)
def test_property_parity_pairs(data, max_length):
    n = data.draw(st.integers(1, 6))
    texts = data.draw(st.lists(ASCII_TEXT, min_size=n, max_size=n))
    pairs = data.draw(st.lists(ASCII_TEXT, min_size=n, max_size=n))
    ids_py, mask_py = _batch_encode(TOK, texts, max_length, pairs)
    out = _native(texts, max_length, pair=pairs)
    assert out is not None
    assert np.array_equal(ids_py, out[0]) and np.array_equal(mask_py, out[1])


@needs_kit
def test_long_token_over_128_bytes():
    """Tokens longer than one BLAKE2b block exercise the multi-block
    compress loop."""
    t = "A" * 400  # one word token, lowercased before hashing
    ids_py, _ = _batch_encode(TOK, [t], 8, None)
    ids_cc, _ = _native([t], 8)
    assert np.array_equal(ids_py, ids_cc)


# -- encode_with_offsets (chunker hot path) -----------------------------------
# Parity reference is the RAW regex+hashlib loop (not SimpleTokenizer.encode,
# which now dispatches to the native path itself — comparing against it would
# be native-vs-native).

def _py_offsets(text):
    from tensortruth_tpu.tokenization.tokenizer import _WORD_RE

    ids, offs = [], []
    for m in _WORD_RE.finditer(text):
        ids.append(TOK._token_id(m.group(0)))
        offs.append((m.start(), m.end()))
    return ids, offs


@needs_kit
def test_offsets_parity_cases():
    cases = [
        "", " ", "a", "hello world", "a_b-c.d", "...", "x" * 600,
        "tabs\tand\nnewlines\x1c\x1dseps", "CAPS lower 42_mixed",
        "punct!runs??end", "  leading and trailing  ",
    ]
    for text in cases:
        expect = _py_offsets(text)
        got = kit.encode_with_offsets(text, TOK.vocab_size, TOK.n_special)
        assert got is not None, text
        assert got == expect, text


@needs_kit
def test_offsets_fallback_nul_astral_sigma():
    assert kit.encode_with_offsets("a\x00b", TOK.vocab_size, TOK.n_special) is None
    assert kit.encode_with_offsets("go 🚀", TOK.vocab_size, TOK.n_special) is None
    assert kit.encode_with_offsets("ΑΣ", TOK.vocab_size, TOK.n_special) is None
    # dispatch end-to-end still equals the pure loop on fallback inputs
    for text in ["pre\x00post", "rocket 🚀 go", "ΤΕΛΟΣ"]:
        assert TOK.encode_with_offsets(text) == _py_offsets(text)
    # ...and non-ASCII BMP text is handled natively now
    got = kit.encode_with_offsets("héllo wörld", TOK.vocab_size, TOK.n_special)
    assert got is not None and got == _py_offsets("héllo wörld")


@needs_kit
@given(text=ASCII_TEXT)
@settings(max_examples=150, deadline=None)
def test_property_offsets_parity(text):
    expect = _py_offsets(text)
    got = kit.encode_with_offsets(text, TOK.vocab_size, TOK.n_special)
    assert got is not None
    assert got == expect


def test_simple_tokenizer_offsets_dispatch_consistent():
    """Whatever path encode_with_offsets takes, chunker-visible output is
    identical to the regex reference (ASCII and non-ASCII)."""
    for text in ["plain ascii text, punct! and_words",
                 "unicode départ — em-dash"]:
        assert TOK.encode_with_offsets(text) == _py_offsets(text)


BMP_TEXT = st.text(
    alphabet=st.characters(min_codepoint=0x09, max_codepoint=0xFFFF,
                           blacklist_categories=("Cs",)),
    max_size=300,
)


@needs_kit
@given(texts=st.lists(BMP_TEXT, min_size=1, max_size=6),
       max_length=st.integers(0, 128))
@settings(max_examples=150, deadline=None)
def test_property_parity_unicode_batch(texts, max_length):
    """Full-BMP property: when the native path answers it matches the
    pure-Python reference exactly; the dispatch ALWAYS matches (fallback
    cases included — Σ may appear in generated text)."""
    ids_py, mask_py = _batch_encode(TOK, texts, max_length, None)
    out = _native(texts, max_length)
    if out is not None:
        assert np.array_equal(ids_py, out[0])
        assert np.array_equal(mask_py, out[1])
    ids_d, mask_d = TOK.encode_batch(texts, max_length)
    assert np.array_equal(ids_py, ids_d) and np.array_equal(mask_py, mask_d)


@needs_kit
@given(text=BMP_TEXT)
@settings(max_examples=150, deadline=None)
def test_property_offsets_parity_unicode(text):
    expect = _py_offsets(text)
    got = kit.encode_with_offsets(text, TOK.vocab_size, TOK.n_special)
    if got is not None:
        assert got == expect
    assert TOK.encode_with_offsets(text) == expect


@needs_kit
def test_unicode_offsets_are_character_indices():
    """Offsets must index CHARACTERS (Python slicing), not UTF-8 bytes —
    the chunker slices str objects with them."""
    text = "héllo wörld — 中文 test"
    ids, offs = kit.encode_with_offsets(text, TOK.vocab_size, TOK.n_special)
    for (s, e), tok in zip(offs, ["héllo", "wörld", "—", "中文", "test"]):
        assert text[s:e] == tok
