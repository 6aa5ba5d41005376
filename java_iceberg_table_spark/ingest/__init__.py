"""Ingestion roles mirroring the reference CLI (Main.java:18-101):
writer fleet (decoupled-commit), direct writer, bookkeeper, reaper."""
