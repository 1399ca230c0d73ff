"""Engine operators: CDC apply, dedup (exact & fuzzy), similarity search,
text analysis, multimodal column plumbing, range/as-of joins."""
