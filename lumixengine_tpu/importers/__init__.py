"""Importers for the reference engine's on-disk formats (≙ the asset-import
half of LumixEngine: world .unv files, FBX models, .anm clips, .res blobs).
Parsers are clean-room implementations from the serializer code's structure
(cited per-module); no reference code is copied."""
