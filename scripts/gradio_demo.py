#!/usr/bin/env python
# coding: utf-8
"""Gradio web demo (counterpart of scripts/gradio_demo.py): speech
recognition / translation UI over a pretrained snapshot."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from joeys2t_tpu.zoo import load


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="local", type=str,
                    help="zoo model name or 'local'")
    ap.add_argument("--model-dir", default=None, type=str)
    ap.add_argument("--share", action="store_true")
    args = ap.parse_args()

    try:
        import gradio as gr
    except ImportError:
        print("This demo requires gradio: pip install gradio")
        sys.exit(1)

    model = load(args.model, model_dir=args.model_dir)
    task = model.args.task

    if task == "S2T":
        def transcribe(audio_path):
            if audio_path is None:
                return ""
            return model.generate([audio_path])[0]

        demo = gr.Interface(
            fn=transcribe,
            inputs=gr.Audio(sources=["microphone", "upload"], type="filepath"),
            outputs="text",
            title="JoeyS2T-TPU speech recognition / translation",
        )
    else:
        def translate(text):
            if not text.strip():
                return ""
            return model.generate([text])[0]

        demo = gr.Interface(fn=translate, inputs="text", outputs="text",
                            title="JoeyS2T-TPU translation")

    demo.launch(share=args.share)


if __name__ == "__main__":
    main()
