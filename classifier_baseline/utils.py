"""Reserved for classifier-baseline helpers (the reference ships this file empty)."""
