"""Application layer: interactive viewer / offline render driver — the
Bevy-app + camera-controls analog (src/main.rs, src/components/camera.rs)."""
