"""Data pipeline tests: tokenizers, synthetic dataset, prefetching loader."""

import numpy as np
import pytest

from textocvp_tpu.data.loader import DataLoader, load_data, unwrap_batch
from textocvp_tpu.data.synthetic import SyntheticBalls
from textocvp_tpu.data.tokenizers import (
    CustomTokenizer,
    HashFallbackT5Tokenizer,
    word_tokenize,
)
from textocvp_tpu.data.vocabularies import CATER_EASY_VOCAB, CATER_HARD_VOCAB


def test_word_tokenize_cater_grammar():
    # the CATER caption grammar: words, negative ints, parens, commas, periods
    text = "the cone containing the snitch is picked up and placed to ( 1 , -2 )"
    toks = word_tokenize(text)
    assert toks == ["the", "cone", "containing", "the", "snitch", "is", "picked",
                    "up", "and", "placed", "to", "(", "1", ",", "-2", ")"]
    for t in toks:
        assert t in CATER_EASY_VOCAB


def test_custom_tokenizer_contract():
    tok = CustomTokenizer(CATER_HARD_VOCAB)
    tokens, lengths = tok.tokenize_batch([
        "the snitch is rotating",
        "the small gold snitch is picked up and placed to ( -3 , 2 )",
    ])
    assert tokens.shape[0] == 2
    assert tokens[0, 0] == CATER_HARD_VOCAB["[CLS]"]
    assert tokens[0, lengths[0] - 1] == CATER_HARD_VOCAB["[SEP]"]
    # padding after the short caption
    assert (tokens[0, lengths[0]:] == CATER_HARD_VOCAB["[PAD]"]).all()
    assert lengths[1] > lengths[0]


def test_hash_fallback_t5_contract():
    tok = HashFallbackT5Tokenizer()
    out = tok(["put the red block in the green bowl", "put the blue block"])
    assert out["caption_tokens"].shape == out["attn_masks"].shape
    assert (out["attn_masks"].sum(1) > 0).all()
    # deterministic
    out2 = tok(["put the red block in the green bowl", "put the blue block"])
    np.testing.assert_array_equal(out["caption_tokens"], out2["caption_tokens"])


def test_synthetic_dataset_deterministic():
    ds = SyntheticBalls(split="test", num_seqs=4, num_frames=5, img_size=(32, 32))
    f1, c1 = ds[0]
    f2, c2 = ds[0]
    np.testing.assert_array_equal(f1, f2)
    assert c1 == c2
    assert f1.shape == (5, 32, 32, 3)
    assert f1.min() >= 0 and f1.max() <= 1
    assert "ball is moving" in c1


def test_loader_batches_and_prefetch():
    ds = SyntheticBalls(split="train", num_seqs=10, num_frames=3, img_size=(16, 16))
    from textocvp_tpu.data.tokenizers import get_tokenizer

    ds.tokenizer = get_tokenizer("CustomTokenizer", ds.vocabulary)
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    videos, info = unwrap_batch(batches[0])
    assert videos.shape == (4, 3, 16, 16, 3)
    assert info["caption_tokens"].shape[0] == 4
    assert len(info["caption"]) == 4
    # last (remainder) batch
    assert batches[-1][0].shape[0] == 2


def test_loader_shuffles_across_epochs():
    ds = SyntheticBalls(split="train", num_seqs=8, num_frames=2, img_size=(8, 8),
                        random_start=False)
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=0)
    b1 = next(iter(loader))[0]
    b2 = next(iter(loader))[0]
    assert not np.allclose(b1, b2)  # different epoch order


def test_load_data_factory():
    exp_params = {"dataset": {
        "dataset_name": "Synthetic", "tokenizer": "CustomTokenizer",
        "num_frames": 3, "img_size": [16, 16], "num_train_seqs": 6,
        "num_eval_seqs": 4, "random_start": True,
    }}
    train = load_data(exp_params, split="train")
    test = load_data(exp_params, split="test")
    assert len(train) == 6 and len(test) == 4
    with pytest.raises(NotImplementedError):
        load_data({"dataset": {"dataset_name": "NopeDB"}})
