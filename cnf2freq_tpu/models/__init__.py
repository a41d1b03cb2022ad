"""Model families beyond the default F2-with-haplotyping configuration."""
