#!/usr/bin/env python
# coding: utf-8
"""Discord bot demo (counterpart of scripts/discord_joey.py): replies to
messages with translations from a pretrained snapshot."""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from joeys2t_tpu.zoo import load


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="local", type=str)
    ap.add_argument("--model-dir", default=None, type=str)
    ap.add_argument("--token", default=os.environ.get("DISCORD_TOKEN"), type=str)
    args = ap.parse_args()
    assert args.token, "provide --token or set DISCORD_TOKEN"

    try:
        import discord
    except ImportError:
        print("This demo requires discord.py: pip install discord.py")
        sys.exit(1)

    model = load(args.model, model_dir=args.model_dir)

    intents = discord.Intents.default()
    intents.message_content = True
    client = discord.Client(intents=intents)

    @client.event
    async def on_ready():
        print(f"Logged in as {client.user}")

    @client.event
    async def on_message(message):
        if message.author == client.user or not message.content.strip():
            return
        translation = model.generate([message.content.strip()])[0]
        await message.channel.send(translation)

    client.run(args.token)


if __name__ == "__main__":
    main()
