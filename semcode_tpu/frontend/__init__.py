"""Frontends: built-in web UI (served by the API at /) and launchers."""
