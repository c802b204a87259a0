"""Tweet search: Earlybird-equivalent realtime index + relevance scoring."""
