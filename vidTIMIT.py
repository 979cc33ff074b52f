"""CLI shim: `python vidTIMIT.py [flags]` — parity with the reference
entry point (/root/reference/vidTIMIT.py:376-379)."""

from multimodal_dmm_tpu.apps.vidtimit import VidTIMITTrainer

if __name__ == "__main__":
    args = VidTIMITTrainer.parser.parse_args()
    trainer = VidTIMITTrainer(args)
    trainer.run(args)
