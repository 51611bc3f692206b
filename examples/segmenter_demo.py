#!/usr/bin/env python3
"""Chinese word segmentation demo: supervised count training + Viterbi.

    python examples/segmenter_demo.py [path/to/icwb2-style-corpus.txt]

With no argument, trains on a tiny built-in corpus.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from lnasr_tpu.models.seg import Seg, SegDataSet, render_segmentation

BUILTIN = [
    "我们 喜欢 学习 语言 模型",
    "他 在 图书馆 学习",
    "隐马尔可夫 模型 很 有用",
    "我们 使用 中文 分词",
    "语言 模型 帮助 中文 分词",
    "他 喜欢 中文",
    "我 用 隐马尔可夫 模型 分词",
] * 5


def main():
    if len(sys.argv) > 1:
        samples = SegDataSet(sys.argv[1])
        print(f"training on {sys.argv[1]}")
    else:
        samples = (SegDataSet.mark(line) for line in BUILTIN)
        print("training on the built-in mini corpus")
    seg = Seg().train(samples)

    for text in ["我们喜欢用隐马尔可夫模型分词", "他在图书馆学习语言模型"]:
        states = seg.segment_states(text)
        rendered, state_line = render_segmentation(text, states)
        print()
        print(rendered)
        print(state_line)
        print(" / ".join(seg.segment(text)))


if __name__ == "__main__":
    main()
