"""Host-side utilities: RLE codec, logging, event storage."""
