"""Command-line layer (reference L6): train/evaluate entry points replacing
fairseq-train / fairseq-generate + per-project shell recipes
(reference SpeechT5/README.md:80-246)."""
