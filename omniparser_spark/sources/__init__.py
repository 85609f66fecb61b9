"""Sources: synthetic change feed + vectorized payload decoders + file readers."""
