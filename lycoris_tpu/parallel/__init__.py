"""lycoris_tpu.parallel — pjit/GSPMD sharded fine-tune path (SURVEY §2.4)."""
