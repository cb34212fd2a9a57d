"""Durable state: checkpoint manifests, offset ledger, schema registry,
connector identity and legacy-state migration."""
