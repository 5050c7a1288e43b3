"""Native C++ featurizer must match the Python featurizer exactly."""

import numpy as np
import pytest

from semcode_tpu.embeddings.hash_embedder import HashEmbeddings
from semcode_tpu.embeddings.native import featurize_batch, get_native

SAMPLES = [
    "def getUserName(user_id):\n    return self._cache[user_id]  # fast path",
    "template <typename T>\nclass RingBuffer { T* data_; size_t cap_; };",
    "x = 1\n" * 500,  # repetition -> count weighting
    "for (int i = 0; i < N; ++i) { sum += a[i] * b[i]; }",
    "CONSTANT_VALUE = HTTPSConnection2XX_Handler + parseJSONResponse",
    "",
    "   \n\t  ",
    "a",
    "snake_case_name camelCaseName PascalCaseName UPPER_SNAKE mixedUP2case",
]


@pytest.fixture(scope="module")
def native_lib():
    lib = get_native()
    if lib is None:
        pytest.skip("native featurizer unavailable (no g++/zlib)")
    return lib


def test_native_matches_python(native_lib):
    emb = HashEmbeddings(dim=32, use_native=False)
    ids_n, wts_n = featurize_batch(SAMPLES, emb.max_features, emb.n_buckets)
    for i, text in enumerate(SAMPLES):
        ids_p, wts_p = emb._featurize(text)
        np.testing.assert_array_equal(
            ids_n[i], ids_p, err_msg=f"ids mismatch on sample {i}: {text[:40]!r}"
        )
        np.testing.assert_allclose(
            wts_n[i], wts_p, rtol=1e-6,
            err_msg=f"weights mismatch on sample {i}",
        )


def test_embedder_same_vectors_with_and_without_native(native_lib):
    a = HashEmbeddings(dim=64, use_native=True)
    b = HashEmbeddings(dim=64, use_native=False)
    va = np.asarray(a.embed_documents(SAMPLES[:5]))
    vb = np.asarray(b.embed_documents(SAMPLES[:5]))
    np.testing.assert_allclose(va, vb, atol=1e-6)


def test_unicode_falls_back_to_python(native_lib):
    a = HashEmbeddings(dim=64, use_native=True)
    b = HashEmbeddings(dim=64, use_native=False)
    texts = ["def f(): return 'héllo wörld'  # ünïcode"]
    np.testing.assert_allclose(
        np.asarray(a.embed_documents(texts)),
        np.asarray(b.embed_documents(texts)),
        atol=1e-6,
    )
