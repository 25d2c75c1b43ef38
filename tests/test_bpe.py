"""ops/text BPE training + encoding vs the classic Sennrich toy example."""

import pandas as pd

import ray.data as rd

from driftray.ops.text import BpeEncoder, bpe_token_counts, bpe_train


def _corpus_ds(word_counts: dict[str, int]):
    texts = []
    for w, c in word_counts.items():
        texts.extend([w] * c)
    # spread words across rows/blocks so the distributed count is exercised
    return rd.from_pandas(pd.DataFrame({"text": texts})).repartition(4)


class TestBpeTrain:
    def test_classic_merge_order(self, ray_session):
        # Sennrich et al. toy: low x5, lower x2, newest x6, widest x3
        ds = _corpus_ds({"low": 5, "lower": 2, "newest": 6, "widest": 3})
        merges = bpe_train(ds, num_merges=4, min_pair_count=2)
        # highest pair: ('e','s') 9, then ('es','t') 9, then ('est','</w>') 9
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")
        assert merges[2] == ("est", "</w>")
        assert merges[3] == ("l", "o")    # 'lo' count 7 beats 'w'+... ties

    def test_deterministic(self, ray_session):
        ds = _corpus_ds({"aaab": 3, "aab": 3, "ab": 3})
        m1 = bpe_train(ds, num_merges=5)
        m2 = bpe_train(_corpus_ds({"aaab": 3, "aab": 3, "ab": 3}),
                       num_merges=5)
        assert m1 == m2

    def test_min_pair_count_stops(self, ray_session):
        ds = _corpus_ds({"ab": 1})
        assert bpe_train(ds, num_merges=10, min_pair_count=2) == []


class TestBpeEncode:
    def test_full_merge_compresses_word(self, ray_session):
        ds = _corpus_ds({"newest": 6, "low": 5})
        merges = bpe_train(ds, num_merges=20, min_pair_count=1)
        enc = BpeEncoder(merges)
        # fully-learned words collapse to ONE token (word + </w> merged in)
        assert enc._encode_word("newest") == 1
        assert enc._encode_word("low") == 1
        # unseen word: only learned pairs apply
        assert enc._encode_word("zzz") == 4          # z z z </w>, no merges

    def test_dataset_counts(self, ray_session):
        ds = _corpus_ds({"newest": 4})
        merges = bpe_train(ds, num_merges=10, min_pair_count=1)
        out = bpe_token_counts(
            rd.from_pandas(pd.DataFrame({"text": ["newest newest", "", None]})),
            merges).to_pandas()
        assert sorted(out["n_bpe_tokens"].tolist()) == [0, 0, 2]
