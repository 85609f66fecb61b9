"""Engine operators: normalize, dedup (LWW + content dedup family),
similarity search, hierarchical assembly, multimodal plumbing."""
