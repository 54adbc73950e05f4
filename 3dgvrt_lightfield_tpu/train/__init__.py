"""Fine-tuning loop (new capability; the reference is inference-only)."""
