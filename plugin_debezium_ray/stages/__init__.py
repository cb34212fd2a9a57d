"""Ray Data stages: envelope decode/format, filters, keyed LWW apply."""
