"""Utilities: diagnostics, checkpointing, validation, debug rendering."""
