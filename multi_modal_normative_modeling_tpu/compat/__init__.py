"""Reference-API compatibility layer (`import cVAE` / imperative training)."""
