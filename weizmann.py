"""CLI shim: `python weizmann.py [flags]` — parity with the reference
entry point (/root/reference/weizmann.py:393-396)."""

from multimodal_dmm_tpu.apps.weizmann import WeizmannTrainer

if __name__ == "__main__":
    args = WeizmannTrainer.parser.parse_args()
    trainer = WeizmannTrainer(args)
    trainer.run(args)
