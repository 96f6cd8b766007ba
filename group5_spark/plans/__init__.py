"""Physical-plan inspection & assertions (scale-hardening gate)."""
