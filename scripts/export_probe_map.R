# Export the probe→UniProt mapping tables the geo stage consumes.
#
# The reference pipeline (/root/reference/code/data_reader.R:4-22) maps GEO
# probe ids to UniProt accessions with Bioconductor annotation databases at
# join time.  Those databases are not redistributable with this framework, so
# `plagnn geo` instead takes a two-column CSV (probe_id,uniprot_id) — the
# exact `toTable(<db>UNIPROT)` export this script produces.
#
# Platforms (README.md:165-175 of the reference):
#   GSE30931  (Bortezomib)      Illumina HumanHT-12 v4 → illuminaHumanv4.db
#   GSE27182  (Tacrolimus)      Affymetrix HG-U133+2   → hgu133plus2.db
#   GSE74572  (Trichostatin A)  Affymetrix HG-U133+2   → hgu133plus2.db
#
# Usage (one-time, any machine with Bioconductor):
#   Rscript scripts/export_probe_map.R <out_dir>
# Then:
#   plagnn geo GSE30931_series_matrix.txt <out_dir>/illuminaHumanv4_uniprot.csv \
#       data/support_materials/GSE30931_exprSet.csv
#   plagnn geo GSE27182_series_matrix.txt <out_dir>/hgu133plus2_uniprot.csv \
#       data/support_materials/GSE27182_exprSet.csv
#   plagnn geo GSE74572_series_matrix.txt <out_dir>/hgu133plus2_uniprot.csv \
#       data/support_materials/GSE74572_exprSet.csv
#
# Install the databases first if missing:
#   BiocManager::install(c("illuminaHumanv4.db", "hgu133plus2.db"))

args <- commandArgs(trailingOnly = TRUE)
out_dir <- if (length(args) >= 1) args[1] else "."

suppressMessages(library(illuminaHumanv4.db))
ids <- toTable(illuminaHumanv4UNIPROT)          # columns: probe_id, uniprot_id
write.csv(ids, file.path(out_dir, "illuminaHumanv4_uniprot.csv"),
          row.names = FALSE, quote = FALSE)

suppressMessages(library(hgu133plus2.db))
ids <- toTable(hgu133plus2UNIPROT)
write.csv(ids, file.path(out_dir, "hgu133plus2_uniprot.csv"),
          row.names = FALSE, quote = FALSE)

cat("wrote", file.path(out_dir, "illuminaHumanv4_uniprot.csv"), "and",
    file.path(out_dir, "hgu133plus2_uniprot.csv"), "\n")
