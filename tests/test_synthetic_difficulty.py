"""protocol_corpus difficulty knobs (VERDICT r2 Weak #3): the override
surface, the mislabeling-noise semantics, and hierarchy consistency."""

import numpy as np
import pytest

from pytextgcn_tpu.data.synthetic import protocol_corpus


def test_unknown_override_rejected():
    with pytest.raises(TypeError, match="unknown protocol_corpus overrides"):
        protocol_corpus("amazon", n_docs=50, typo_knob=1.0)


def test_label_noise_keeps_document_text_stable():
    # noise draws happen AFTER text generation, so the document stream is
    # identical across settings — calibration sweeps compare like with like
    docs0, labels0, *_ = protocol_corpus("amazon", n_docs=300, label_noise=0.0)
    docs1, labels1, *_ = protocol_corpus("amazon", n_docs=300, label_noise=0.3)
    assert docs0 == docs1
    flipped = np.mean(np.asarray(labels0[-1]) != np.asarray(labels1[-1]))
    assert 0.1 < flipped < 0.45  # ~0.3 x (1 - prior collision mass)


def test_noisy_labels_stay_hierarchy_consistent():
    _, labels, *_ = protocol_corpus("dbpedia", n_docs=300, label_noise=0.5)
    # recover the child->parent maps from the joint distribution: every
    # leaf value must map to exactly one l2 value, and l2 to one l1
    for child, parent in ((labels[2], labels[1]), (labels[1], labels[0])):
        child, parent = np.asarray(child), np.asarray(parent)
        for c in np.unique(child):
            assert len(np.unique(parent[child == c])) == 1


def test_dbpedia_leaf_vocab_off_falls_back_to_shared_pools():
    docs, labels, *_ = protocol_corpus("dbpedia", n_docs=120, leaf_vocab_size=0)
    assert not any("leaf" in d for d in docs)
    docs2, *_ = protocol_corpus("dbpedia", n_docs=120)
    assert any("leaf" in d for d in docs2)  # default keeps a small leaf vocab
