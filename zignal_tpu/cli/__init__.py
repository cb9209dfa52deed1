"""CLI package: 12 subcommands mirroring the reference
(reference: src/cli/)."""
