"""Core: type enums, static config, the SoA world-state pytree, scene builder."""
