"""Synthetic VCF fixture builder (FIXTURES.md 'Raw-VCF fixture').

Covers: CSQ multi-transcript (comma) + multi-consequence ('&'),
all-missing FORMAT field (probe skip rule), multi-value FORMAT (AD,
Number=R), phased/unphased/missing genotypes, Flag INFO, '.' QUAL,
indel end arithmetic, clinvar_sig INFO routing, and (separately) a
multiallelic record for the reject channel.
"""

from __future__ import annotations

CSQ_DESC = (
    "Consequence annotations from Ensembl VEP. Format: "
    "Allele|Consequence|IMPACT|SYMBOL|SYMBOL_SOURCE|Gene|Feature_type|Feature"
    "|BIOTYPE|EXON|INTRON|CANONICAL|gnomAD_AF|CLIN_SIG"
)

HEADER = [
    "##fileformat=VCFv4.2",
    '##contig=<ID=1,length=249250621>',
    '##contig=<ID=2,length=243199373>',
    '##contig=<ID=X,length=155270560>',
    '##FILTER=<ID=PASS,Description="All filters passed">',
    '##FILTER=<ID=LowQual,Description="Low quality">',
    '##INFO=<ID=AC,Number=A,Type=Integer,Description="Allele count">',
    '##INFO=<ID=AF,Number=A,Type=Float,Description="Allele frequency">',
    '##INFO=<ID=AN,Number=1,Type=Integer,Description="Allele number">',
    '##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">',
    '##INFO=<ID=DB,Number=0,Type=Flag,Description="dbSNP membership">',
    '##INFO=<ID=VT,Number=1,Type=String,Description="Variant type">',
    '##INFO=<ID=clinvar_sig,Number=1,Type=String,Description="ClinVar significance">',
    f'##INFO=<ID=CSQ,Number=.,Type=String,Description="{CSQ_DESC}">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
    '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Read depth">',
    '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality">',
    '##FORMAT=<ID=AD,Number=R,Type=Integer,Description="Allelic depths">',
    '##FORMAT=<ID=FT,Number=1,Type=String,Description="Per-sample filter">',
]

SAMPLES = ["HG001", "HG002", "HG003", "HG004"]

FMT = "GT:DP:GQ:AD:FT"


def _rec(chrom, pos, ref, alt, qual, filt, info, genos):
    cols = [chrom, str(pos), ".", ref, alt, qual, filt, info, FMT] + genos
    return "\t".join(cols)


RECORDS = [
    _rec(
        "1", 100, "A", "G", "50", "PASS",
        "AC=1;AF=0.25;AN=8;DP=40;VT=SNP;clinvar_sig=benign;"
        "CSQ=G|missense_variant|MODERATE|GENE1|EntrezGene|ENSG01|Transcript|ENST01|protein_coding|2/5||YES|0.01|benign,"
        "G|intron_variant|MODIFIER|GENE1|EntrezGene|ENSG01|Transcript|ENST02|protein_coding||3/7||0.01|benign",
        ["0|0:10:99:8,2:.", "0/1:12:88:6,6:.", "1|1:9:77:0,9:.", "./.:.:.:.:."],
    ),
    _rec(
        "1", 205, "T", "C", "30", "LowQual",
        "AC=2;AF=0.5;AN=8;DP=35;VT=SNP;DB;"
        "CSQ=C|splice_region_variant&synonymous_variant|LOW|GENE2|EntrezGene|ENSG02|Transcript|ENST03|protein_coding|3/3||YES|0.2|",
        ["0/1:15:60:9,6:.", "0|0:11:95:11,0:.", "./1:8:40:4,4:.", "1/.:7:33:3,4:."],
    ),
    _rec(
        "1", 300, "G", "A", ".", "PASS",
        "AC=0;AF=0.0;AN=8;DP=20;VT=SNP",
        ["0/.:5:20:5,0:.", "0:6:25:6,0:.", "1:4:15:2,2:.", "2/2:3:10:0,3:."],
    ),
    _rec(
        "2", 50, "C", "T", "99", "PASS",
        "AC=3;AF=0.75;AN=8;DP=60;VT=SNP;clinvar_sig=pathogenic;"
        "CSQ=T|intron_variant|MODIFIER|GENE3|HGNC|ENSG03|Transcript|ENST04|lincRNA||1/2||0.5|",
        ["1|1:20:99:0,20:.", "1|0:18:90:9,9:.", "0|1:17:85:8,9:.", "1/1:16:80:0,16:."],
    ),
    _rec(
        "2", 120, "AT", "A", "77", "PASS",
        "AC=1;AF=0.125;AN=8;DP=45;VT=INDEL;"
        "CSQ=-|frameshift_variant|HIGH|GENE2|EntrezGene|ENSG02|Transcript|ENST03|protein_coding|4/4||YES|0.001|pathogenic",
        ["0/0:13:70:13,0:.", "./.:.:.:.:.", "0/1:12:65:6,6:.", "0|0:14:75:14,0:."],
    ),
    _rec(
        "X", 10, "G", "C", "42", "PASS",
        "AC=2;AF=0.25;AN=8;DP=30;VT=SNP;DB",
        ["0/1:9:50:5,4:.", "1/1:8:45:0,8:.", "0/0:10:55:10,0:.", "0|1:7:40:3,4:."],
    ),
]

MULTIALLELIC = _rec(
    "1", 400, "A", "G,T", "60", "PASS",
    "AC=1,1;AF=0.125,0.125;AN=8;DP=50;VT=SNP",
    ["1/2:10:50:5,3:.", "0/0:11:55:11,0:.", "0/1:9:45:5,4:.", "0/2:8:40:4,4:."],
)


def write_vcf(path: str, include_multiallelic: bool = False) -> str:
    lines = list(HEADER)
    lines.append("\t".join(
        ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT"]
        + SAMPLES
    ))
    lines += RECORDS
    if include_multiallelic:
        lines.append(MULTIALLELIC)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path
