"""Command-line interface.

The reference has no CLI/config system (constructor kwargs only,
SURVEY.md §5). Subcommands cover the common flows:

    python -m lnasr_tpu.cli mfcc IN.pcm OUT.npy        # features
    python -m lnasr_tpu.cli vad IN.pcm                 # speech segments
    python -m lnasr_tpu.cli train-seg CORPUS OUT.hdf5  # segmenter training
    python -m lnasr_tpu.cli seg MODEL.hdf5 "文本..."    # segmentation
    python -m lnasr_tpu.cli lm-train CORPUS OUT.lm     # ARPA n-gram LM
    python -m lnasr_tpu.cli lm-ppl MODEL.lm "text"     # perplexity
    python -m lnasr_tpu.cli bench                      # headline benchmark
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _cmd_mfcc(args) -> int:
    from lnasr_tpu.config import MFCCConfig
    from lnasr_tpu.models.mfcc import MFCC
    from lnasr_tpu.utils.audio import read_pcm, read_wave

    if args.input.endswith(".wav"):
        audio, _ = read_wave(args.input)
    else:
        audio = read_pcm(args.input)
    cfg = MFCCConfig(spectrum_method=args.spectrum)
    feats = np.asarray(MFCC(cfg)(audio).features)
    np.save(args.output, feats)
    print(f"{args.input}: {len(audio) / cfg.sample_rate:.2f}s -> {feats.shape} "
          f"features -> {args.output}")
    return 0


def _cmd_vad(args) -> int:
    from lnasr_tpu.models.recognizer import segment_speech
    from lnasr_tpu.utils.audio import read_pcm, read_wave
    from lnasr_tpu.vad.native import AmrWbVad, WebRtcVad

    audio = (read_wave(args.input)[0] if args.input.endswith(".wav")
             else read_pcm(args.input))
    if args.detector == "webrtc":
        vad = WebRtcVad(mode=args.mode)
        flags = vad.process(audio)
        frame = vad.FRAME_LEN
    else:
        vad = AmrWbVad()
        flags, _ = vad.process(audio)
        frame = vad.FRAME_LEN
    for a, b in segment_speech(flags, frame):
        print(f"speech\t{a / 16000:.2f}\t{b / 16000:.2f}")
    return 0


def _cmd_train_seg(args) -> int:
    from lnasr_tpu.models.seg import Seg, SegDataSet

    seg = Seg().train(SegDataSet(args.corpus))
    seg.save(args.output)
    print(f"segmenter trained on {args.corpus} -> {args.output}")
    return 0


def _cmd_seg(args) -> int:
    from lnasr_tpu.models.seg import Seg

    seg = Seg().load(args.model)
    print(" ".join(seg.segment(args.text)))
    return 0


def _cmd_lm_train(args) -> int:
    from lnasr_tpu.models.ngram import (
        NGramCounter, NGramModel, NGramModelARPA, Tokenizer,
    )

    with open(args.corpus, encoding="utf-8") as fp:
        tokens = [Tokenizer.get_tokens(line.strip()) for line in fp if line.strip()]
    model = NGramModel(NGramCounter(args.order, tokens))
    NGramModelARPA().save(model, args.output)
    print(f"{args.order}-gram LM over {len(tokens)} sentences -> {args.output}")
    return 0


def _cmd_lm_ppl(args) -> int:
    from lnasr_tpu.models.ngram import NGramModel, NGramModelARPA, Tokenizer

    model = NGramModel(NGramModelARPA().load(args.model))
    sent = Tokenizer.get_tokens(args.text)
    print(f"logprob={model.calc_prob(sent):.4f} ppl={model.calc_ppl(sent):.3f}")
    return 0


def _cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="lnasr_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("mfcc", help="extract MFCC features")
    p.add_argument("input"), p.add_argument("output")
    p.add_argument("--spectrum", choices=["matmul", "fft"], default="matmul")
    p.set_defaults(fn=_cmd_mfcc)

    p = sub.add_parser("vad", help="voice activity segments")
    p.add_argument("input")
    p.add_argument("--detector", choices=["webrtc", "amrwb"], default="webrtc")
    p.add_argument("--mode", type=int, default=0)
    p.set_defaults(fn=_cmd_vad)

    p = sub.add_parser("train-seg", help="train the word segmenter")
    p.add_argument("corpus"), p.add_argument("output")
    p.set_defaults(fn=_cmd_train_seg)

    p = sub.add_parser("seg", help="segment text")
    p.add_argument("model"), p.add_argument("text")
    p.set_defaults(fn=_cmd_seg)

    p = sub.add_parser("lm-train", help="train an ARPA n-gram LM")
    p.add_argument("corpus"), p.add_argument("output")
    p.add_argument("--order", type=int, default=3)
    p.set_defaults(fn=_cmd_lm_train)

    p = sub.add_parser("lm-ppl", help="sentence perplexity under an ARPA LM")
    p.add_argument("model"), p.add_argument("text")
    p.set_defaults(fn=_cmd_lm_ppl)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.set_defaults(fn=_cmd_bench)

    args = parser.parse_args(argv)
    if args.command in ("seg", "train-seg", "lm-train", "lm-ppl", "vad"):
        # host-scale tasks: a remote accelerator round-trip (compile over a
        # TPU tunnel) costs minutes for models that run in milliseconds on
        # the host CPU
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized by the caller
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
