"""Chinese word segmentation app: auto-labeling, count training, decoding."""

import numpy as np
import pytest

from lnasr_tpu.models.seg import Seg, SegDataSet, render_segmentation

# A tiny segmented training corpus (space-separated words, as icwb2/PKU),
# with 1-, 2-, 3- and 4-char words so all of B/M/E/S occur
CORPUS = [
    "我们 喜欢 学习 语言 模型",
    "他们 喜欢 学习 数学",
    "我们 学习 中文 分词",
    "语言 模型 帮助 中文 分词",
    "他们 使用 语言 模型",
    "我们 使用 中文",
    "中文 分词 需要 语言 模型",
    "学习 中文 需要 模型",
    "我 在 图书馆 学习",
    "他 喜欢 去 图书馆",
    "隐马尔可夫 模型 很 有用",
    "我 用 隐马尔可夫 模型 分词",
] * 4


def test_mark_labels():
    marked = SegDataSet.mark("我们 喜欢 学习")
    assert marked["data"] == "我们喜欢学习"
    assert marked["state"] == "BEBEBE"
    # single characters and punctuation
    marked = SegDataSet.mark("我 爱 你。")
    assert marked["data"] == "我爱你。"
    assert marked["state"] == "SSSS"
    # multi-character word
    marked = SegDataSet.mark("图书馆")
    assert marked["state"] == "BME"


def test_train_and_segment():
    seg = Seg().train(SegDataSet.mark(line) for line in CORPUS)
    words = seg.segment("我们喜欢学习中文")
    assert words == ["我们", "喜欢", "学习", "中文"]
    words = seg.segment("他们使用语言模型")
    assert words == ["他们", "使用", "语言", "模型"]


def test_segment_states_valid():
    seg = Seg().train(SegDataSet.mark(line) for line in CORPUS)
    states = seg.segment_states("语言模型帮助分词")
    assert set(states) <= set("BMES")
    # B must never be followed by B or S directly; E/S never by M/E
    for a, b in zip(states, states[1:]):
        if a == "B":
            assert b in "ME"
        if a in "ES":
            assert b in "BS"


def test_unseen_characters_fall_back():
    """Characters never seen in training still decode (add-one smoothing)."""
    seg = Seg().train(SegDataSet.mark(line) for line in CORPUS)
    words = seg.segment("żółw隐马尔可夫")
    assert "".join(words) == "żółw隐马尔可夫"


def test_save_load_roundtrip(tmp_path):
    seg = Seg().train(SegDataSet.mark(line) for line in CORPUS)
    path = str(tmp_path / "seg.hdf5")
    seg.save(path)
    seg2 = Seg().load(path)
    text = "我们学习语言模型"
    assert seg2.segment(text) == seg.segment(text)


def test_render_segmentation():
    text, state = render_segmentation("我们学习", "BEBE")
    assert text == "我们 学习 "
    # CJK chars are double width: each gets a trailing alignment space
    assert state == "B E  B E  "
