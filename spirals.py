"""CLI shim: `python spirals.py [flags]` — parity with the reference
entry point (/root/reference/spirals.py:208-211)."""

from multimodal_dmm_tpu.apps.spirals import SpiralsTrainer

if __name__ == "__main__":
    args = SpiralsTrainer.parser.parse_args()
    trainer = SpiralsTrainer(args)
    trainer.run(args)
