"""HTTP API: aiohttp JSON service with jobs, telemetry, and API-key auth."""
