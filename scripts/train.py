#!/usr/bin/env python
"""Training CLI (ref: JLM:train/train.py — SURVEY.md §5.2).

  python scripts/train.py --data data/ --exp experiments/h512-v50k \
      --hidden-size 512 --epochs 8 [--sampled-softmax 1024] [--dsoftmax]
"""

import argparse

from jlm_tpu.config import Config, default_dsoftmax_blocks
from jlm_tpu.data.io import load_dataset
from jlm_tpu.train import train_lm


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--exp", required=True, help="experiment output dir")
    ap.add_argument("--embed-size", type=int, default=256)
    ap.add_argument("--hidden-size", type=int, default=512)
    ap.add_argument("--num-layers", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--num-steps", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr-decay", type=float, default=0.8)
    ap.add_argument("--optimizer", default="adam", choices=["adam", "sgd"])
    ap.add_argument("--sampled-softmax", type=int, default=0)
    ap.add_argument("--dsoftmax", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    vocab, train, dev, _ = load_dataset(args.data)
    cfg = Config(
        vocab_size=len(vocab),
        embed_size=args.embed_size,
        hidden_size=args.hidden_size,
        num_layers=args.num_layers,
        batch_size=args.batch_size,
        num_steps=args.num_steps,
        epochs=args.epochs,
        optimizer=args.optimizer,
        learning_rate=args.lr,
        lr_decay=args.lr_decay,
        sampled_softmax_samples=args.sampled_softmax,
        head="dsoftmax" if args.dsoftmax else "full",
        dsoftmax=(
            default_dsoftmax_blocks(len(vocab), args.hidden_size)
            if args.dsoftmax
            else None
        ),
        seed=args.seed,
    )
    train_lm(cfg, train, dev, exp_dir=args.exp)


if __name__ == "__main__":
    main()
