#!/usr/bin/env python3
"""Build a locally-compilable copy of the reference cnF2freq binary.

The container has no boost, no xstd::bit_set, and no toulbar2. This script

1. copies ``cnF2freq.cpp`` + ``settings.h`` from /root/reference into
   ``.refbuild/`` (gitignored -- the reference source is never committed),
2. applies a minimal patch set: XSTDBITSET off (covertype falls back to the
   reference's own ``set<int>`` branch, cnF2freq.cpp:4739), spirit-x3
   dependent readers stubbed or re-expressed in plain C++ (the PlantImpute
   demo path -- readalphamap/ped/data, postmarkerdata, doit, the haplotype
   dump -- is not touched),
3. compiles with the flags from the reference's demo.sh:6 against the shim
   headers in refbaseline/include (hand-written stand-ins for the used boost
   API surface).

The resulting binary is the measured CPU baseline (BASELINE.md) and the
oracle for the stage-by-stage parity harness. Run it with
OMP_NUM_THREADS=1 for deterministic output and with refbaseline/ on PATH so
the ``toulbar2`` WCNF-solver shim is found (cnF2freq.cpp:6078-6084 spawns
``toulbar2`` via /bin/sh).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(REPO, ".refbuild")


def span_replace(text, begin_anchor, end_anchor, replacement, expect_from=0):
    """Replace [begin_anchor, end_anchor) with replacement.

    begin_anchor must occur exactly once at/after expect_from; end_anchor is
    the first occurrence after the begin. Returns (new_text, end_index).
    """
    i = text.index(begin_anchor, expect_from)
    if text.find(begin_anchor, i + 1) != -1:
        raise SystemExit(f"anchor not unique: {begin_anchor[:60]!r}")
    j = text.index(end_anchor, i + len(begin_anchor))
    return text[:i] + replacement + text[j:], i + len(replacement)


STUB_PRELUDE = r"""
// ---- refbaseline patch: spirit-x3 parsing layer replaced ----------------
// The functions below either abort (formats not exercised by the demo or
// the baseline benchmark) or are re-expressed in plain C++ with the same
// observable behavior. Everything else in this file is reference code.
#include <cstdio>
static void refshim_unavailable(const char* what)
{
	fprintf(stderr, "refbaseline shim: %s is not available in this build\n", what);
	abort();
}
// -------------------------------------------------------------------------

"""

SAMPLEREADER_STUB = r"""typedef std::vector<std::tuple<std::string, std::string, std::string>> sampletype;

struct samplereader
{
	sampletype samples;
	void read(mapped_file_source&) { refshim_unavailable("samplereader (.sample parsing)"); }
};

"""

READHAPSFULL_STUB = r"""void readhapsfull(const sampletype& samples, mapped_file_source& bimFile, vector<mapped_file_source*>& hapsFile)
{
	refshim_unavailable("readhapsfull (.bim/.haps parsing)");
}

"""

READHAPSONLY_STUB = r"""void readhapsonly(vector<mapped_file_source*>& hapsFile)
{
	refshim_unavailable("readhapsonly (.haps parsing)");
}

"""

CREATEHAPFILE_STUB = r"""void createhapfile(const sampletype& samples, mapped_file_source& oldhapfile, ostream& newhapfile)
{
	refshim_unavailable("createhapfile (.haps rewriting)");
}

"""

READFAMBED_STUB = r"""void readfambed(std::string famFileName, std::string bedFileName, bool readall = true, bool dooverwrite = false)
{
	refshim_unavailable("readfambed (PLINK .fam/.bed parsing)");
}

#endif  // READHAPSSAMPLE (reopened by refbaseline patch; closes cnF2freq.cpp:6837)

"""

READGIGI_STUB = r"""void readgigidata(mapped_file_source&& map, mapped_file_source&& ped)
{
	refshim_unavailable("readgigidata (Gigi map/ped parsing)");
}

"""

# Plain-C++ re-expressions of the two trivial spirit parsers (semantics from
# cnF2freq.cpp:7518-7549): protmarkers = "map marker positions" header then
# whitespace-separated cM doubles; protinds = per line "<field> <name>".
ADDPROT_IMPL = r"""void addprotmarkers(set<double>& protmarkers, mapped_file_source&& source)
{
	std::istringstream in(std::string(source.begin(), source.end()));
	std::string tok;
	while (in >> tok)
	{
		try { protmarkers.insert(std::stod(tok)); }
		catch (...) { /* header words: map marker positions */ }
	}
}

void addprotinds(set<individ*>& protinds, mapped_file_source&& source)
{
	std::istringstream in(std::string(source.begin(), source.end()));
	std::string line;
	while (std::getline(in, line))
	{
		std::istringstream ls(line);
		std::string field, name;
		if (!(ls >> field >> name)) continue;
		individ* ind = getind(name, false);
		if (ind == 0)
		{
			fprintf(stderr, "Incorrect individual name. %s\n", name.c_str());
		}
		protinds.insert(ind);
	}
}

"""

# Plain-C++ re-expression of deserialize (semantics from
# cnF2freq.cpp:7757-7832): header lines "<n> <name>", then one
# "<haploweight> <a> <b> <negshift> <sure1> <sure2> [...]" row per marker.
DESERIALIZE_IMPL = r"""void deserialize(istream& stream)
{
	string line;
	while (std::getline(stream, line))
	{
		std::istringstream hdr(line);
		int n;
		string name, extra;
		if (!(hdr >> n >> name) || (hdr >> extra))
		{
			if (!line.empty())
				std::cerr << "Supposed individual header not a header: " << line << std::endl;
			continue;
		}

		individ* ind = getind(n, false);
		individ* indcheck = getind(name, false);

		if (ind && ind == indcheck)
		{
			int oldphase = 0;
			int switches = 0;
			for (size_t i = 0; i < markerposes.size(); i++)
			{
				std::getline(stream, line);
				double hw, ns, sure1, sure2;
				int a, b;
				if (sscanf(line.c_str(), "%lf %d %d %lf %lf %lf", &hw, &a, &b, &ns, &sure1, &sure2) != 6)
				{
					std::cerr << "Reading haplotype for marker " << i << " for individual " << ind->name << " failed: " << line << std::endl;
				}
				else
				{
					ind->haploweight[i] = hw;

					pair<MarkerVal, MarkerVal> pmv = make_pair(a * MarkerValue, b * MarkerValue);
					pair<MarkerVal, MarkerVal> rmv = make_pair(b * MarkerValue, a * MarkerValue);
					bool inv = false;
					bool match = true;
					if (pmv != ind->markerdata[i])
					{
						if (rmv != ind->markerdata[i])
						{
							std::cerr << "Genotype mismatch for marker " << i << " for individual " << ind->name << " (" << ind->markerdata[i].first.value() << "," << ind->markerdata[i].second.value() << ") to " <<
								" (" << pmv.first.value() << "," << pmv.second.value() << ")" << std::endl;
							match = false;
						}
						else inv = true;
					}
					ind->markerdata[i] = pmv;
					ind->markersure[i] = make_pair(sure1, sure2);
					if (ind->haploweight[i] == 0.5) continue;
					if (pmv == rmv) continue;
					if (!match) continue;

					int newphase = 1 + ((ind->haploweight[i] > 0.5) ^ inv);
					if (oldphase && oldphase != newphase) switches++;

					oldphase = newphase;
				}
			}

			if (ind->children || (ind->pars[0] && !ind->pars[0]->empty) || (ind->pars[1] && !ind->pars[1]->empty)) std::cout << "Switches " << ind->n << " " << ind->name << "\t" << switches << std::endl;
		}
		else
		{
			std::cerr << "Supposed individual header not a header: " << line << std::endl;
		}
	}
}

"""


def patch_source(src):
    # 0. includes the reference picked up transitively through boost
    src = src.replace(
        "#include <exception>\n#include <cstdlib>",
        "#include <exception>\n#include <cstdlib>\n"
        "#include <atomic>\n#include <sstream>\n"
        "#include <boost/refshim_core.hpp>",
        1)
    # 1. parseToEndWithError templates (spirit phrase_parse) -> prelude
    src, at = span_replace(
        src,
        "template<class RuleType, class AttrType> void parseToEndWithError",
        "#ifdef READHAPSSAMPLE",
        STUB_PRELUDE,
    )
    # 2. x3 grammar rules + samplereader -> typedef + stub struct
    src, at = span_replace(
        src, "auto word_ = x3::lexeme", "using SnpDataType",
        SAMPLEREADER_STUB, at)
    # 3. big readers
    src, at = span_replace(
        src, "void readhapsfull(const sampletype& samples",
        "void readhapsonly", READHAPSFULL_STUB, at)
    src, at = span_replace(
        src, "void readhapsonly(vector<mapped_file_source*>& hapsFile)",
        "void createhapfile", READHAPSONLY_STUB, at)
    src, at = span_replace(
        src, "void createhapfile(const sampletype& samples",
        "void readfambed", CREATEHAPFILE_STUB, at)
    src, at = span_replace(
        src, "void readfambed(std::string famFileName",
        "auto mapline = ", READFAMBED_STUB, at)
    src, at = span_replace(
        src, "auto mapline = ", "void addprotmarkers", READGIGI_STUB, at)
    src, at = span_replace(
        src, "void addprotmarkers(set<double>& protmarkers",
        "void clearunprotected", ADDPROT_IMPL, at)
    src, at = span_replace(
        src, "void deserialize(istream& stream)",
        "std::string getname(individ* ind)", DESERIALIZE_IMPL, at)
    if "<sstream>" not in src:
        src = src.replace("#include <fstream>", "#include <fstream>\n#include <sstream>", 1)

    # ---- instrumentation for the parity harness -------------------------
    # (a) full-precision haplotype dump: the reference's %f/%lf columns
    # truncate at 6 decimals, masking sub-1e-6 agreement or disagreement.
    src = src.replace(
        'fprintf(out, "%f\\t%d\\t%d\\t\\t%f\\t%lf %lf %lf\\t%d\\t%d\\t%lf\\t%lf\\n"',
        'fprintf(out, "%.17g\\t%d\\t%d\\t\\t%.17g\\t%.17g %.17g %.17g\\t%d\\t%d\\t%.17g\\t%.17g\\n"')
    src = src.replace(
        'fprintf(out, "%f\\t%d\\t%d\\t\\t%f\\t%lf %lf %lf\\n"',
        'fprintf(out, "%.17g\\t%d\\t%d\\t\\t%.17g\\t%.17g %.17g %.17g\\n"')
    # (b) REFTRACE=1: per-individual per-marker informativeness variances
    # (the lockhaplos input) on stderr.
    old = "ind->addvariance(j, flag2ignore);"
    new = ("{ ind->addvariance(j, flag2ignore); "
           "if (getenv(\"REFTRACE\")) fprintf(stderr, \"VAR %d %d %.17g\\n\", "
           "ind->n, j, ind->variances[j]); }")
    if src.count(old) != 1:
        raise SystemExit("addvariance anchor not unique")
    src = src.replace(old, new)
    # (c) REFTRACE2: per-(shift, majori, majorflag2) group sums inside
    # addvariance, to localize emission-semantics divergences.
    old = "sqsum += ok * ok;"
    new = ("sqsum += ok * ok; if (getenv(\"REFTRACE2\")) "
           "fprintf(stderr, \"AVGRP %d %d %d %d %d %.17g %.17g\\n\", "
           "n, marker, shiftflagmode, majori, majorflag2, ok, fullok);")
    if src.count(old) != 1:
        raise SystemExit("sqsum anchor not unique")
    src = src.replace(old, new)
    # (d) REFTRACE3: individual nonzero addvariance emission terms.
    old = ("ok += term * (allele ? 1 : -1);")
    new = ("ok += term * (allele ? 1 : -1); if (getenv(\"REFTRACE3\") && term) "
           "fprintf(stderr, \"AVTERM %d %d %d %d %d %d %.17g\\n\", "
           "n, marker, *(tb.shiftflagmode), i, flag2, allele, term);")
    if src.count(old) != 1:
        raise SystemExit("avterm anchor not unique")
    src = src.replace(old, new)
    # (e) REFTRACE4=<ind>, REFTRACE4M=<marker>: per-level nonzero emission
    # contributions inside trackpossible during that individual's
    # addvariance, with full call context.
    src = src.replace(
        "#define none cnF2freqNONE",
        "#define none cnF2freqNONE\nint reftrace_in_av = 0;", 1)
    old = "		int count = 0;"
    new = ("		int count = 0;\n"
           "		reftrace_in_av = (getenv(\"REFTRACE4\") && "
           "n == atoi(getenv(\"REFTRACE4\")) && getenv(\"REFTRACE4M\") && "
           "marker == (unsigned)atoi(getenv(\"REFTRACE4M\")));")
    if src.count(old) != 1:
        raise SystemExit(f"count anchor count={src.count(old)}")
    src = src.replace(old, new)
    old = "			if (baseval)\n			{\n			ok += baseval;"
    new = ("			if (baseval)\n			{\n"
           "			if (reftrace_in_av)"
           " fprintf(stderr, \"TP %d %u %u %d %d %d %d %d %.17g\\n\", n, genwidth,"
           " flag, flag99, localshift, (int)inmarkerval.value(), flag2, update, baseval);\n"
           "			ok += baseval;")
    if src.count(old) != 1:
        raise SystemExit(f"tp anchor count={src.count(old)}")
    src = src.replace(old, new)
    # (f) REFTRACE: accumulator state entering the parameter-update phase
    # (haplobase/haplocount/negshift per marker; infprobs per side/allele).
    old = '					fprintf(out, "SKEWNESS PASS: %d\\n", i);'
    new = ('					fprintf(out, "SKEWNESS PASS: %d\\n", i);\n'
           '					if (getenv("REFTRACE"))\n'
           '					{\n'
           '						for (size_t j = 0; j < ind->haplocount.size(); j++)\n'
           '						{\n'
           '							if (ind->haplobase[j] || ind->haplocount[j] || ind->negshift[j])\n'
           '								fprintf(stderr, "ACC %d %d %.17g %.17g %.17g\\n", i, (int) j, ind->haplobase[j], ind->haplocount[j], ind->negshift[j]);\n'
           '							for (int side = 0; side < 2; side++)\n'
           '								for (auto& kv : ind->infprobs[j][side])\n'
           '									fprintf(stderr, "INF %d %d %d %d %.17g\\n", i, (int) j, side, kv.first.value(), kv.second);\n'
           '						}\n'
           '					}')
    if src.count(old) != 1:
        raise SystemExit(f"skewness anchor count={src.count(old)}")
    src = src.replace(old, new)
    # (f2) REFTRACE11: the per-state emission weights adjustprobs
    # multiplies in (realok for flag99 == -1), keyed by individual,
    # marker, state — pinpoints emission vs transition divergences.
    old = ("				sum += val;\n"
           "				probs[i] = val;")
    new = ("				sum += val;\n"
           "				probs[i] = val;\n"
           "				if (getenv(\"REFTRACE11\") && flag99 == -1)"
           " fprintf(stderr, \"EMI %d %u %u %d %.17g\\n\", this->n, marker,"
           " i, *(tb.shiftflagmode), realok);")
    if src.count(old) != 1:
        raise SystemExit(f"emi anchor count={src.count(old)}")
    src = src.replace(old, new)
    # (g) REFTRACE5: per-probe posterior weights in the doit probe loop.
    old = ("									val = exp(val);\n"
           "									int marker = -q - 1000;")
    new = ("									val = exp(val);\n"
           "									int marker = -q - 1000;\n"
           "									if (getenv(\"REFTRACE5\"))"
           " fprintf(stderr, \"PRB %d %d %d %d %d %.17g\\n\","
           " dous[j]->n, marker, g, flag2, *(tb.shiftflagmode), val);")
    if src.count(old) != 1:
        raise SystemExit(f"prb anchor count={src.count(old)}")
    src = src.replace(old, new)
    old = ("		if (selfingNOW && extparams.gstr) *extparams.gstr *= 2;\n"
           "		return ok;")
    new = ("		if (selfingNOW && extparams.gstr) *extparams.gstr *= 2;\n"
           "		if (reftrace_in_av)"
           " fprintf(stderr, \"TPRET %d %u %u %d %d %d %.17g\\n\", n, genwidth,"
           " flag, flag99, localshift, (int)inmarkerval.value(), ok);\n"
           "		return ok;")
    if src.count(old) != 1:
        raise SystemExit(f"tpret anchor count={src.count(old)}")
    src = src.replace(old, new)
    # (h) REFTRACE6: updatehaploweights per-marker terms + result
    # (relskewterm, similarity, descendants, children, adjusted
    # haplobase/haplocount, the intended value from cappedgd).
    old = ('\t\t\t\tdouble intended = cappedgd(gradient, '
           'ind->haploweight[j], maxdiff / (ind->children + 1), hitnnn, '
           'ind->lastinved[cno] != -1);')
    new = (old + '\n\t\t\t\tif (getenv("REFTRACE6")) fprintf(stderr, '
           '"UHW %d %d %.17g %.17g %.17g %.17g %d %d %d %.17g\\n", '
           'ind->n, (int) j, relskewterm, similarity, ind->haplobase[j], '
           'ind->haplocount[j], ind->descendants, ind->children, '
           '(int) (ind->lastinved[cno] != -1), intended);')
    if src.count(old) != 1:
        raise SystemExit(f"uhw anchor count={src.count(old)}")
    src = src.replace(old, new)
    # (i) REFTRACE7: the per-marker WCNF clauses entering the solve stage
    # (after relskew reweighting, before the cost transformation), plus
    # the winning candidate set per chromosome.
    old = "			long long fakegain = 0;"
    new = ('			if (getenv("REFTRACE7"))\n'
           '				for (clause& c : toulInput[m]) {\n'
           '					fprintf(stderr, "CLS %d %lld", m, c.weight);\n'
           '					for (int v : c.cinds) fprintf(stderr, " %d", v);\n'
           '					fprintf(stderr, "\\n");\n'
           '				}\n' + old)
    if src.count(old) != 1:
        raise SystemExit(f"cls anchor count={src.count(old)}")
    src = src.replace(old, new)
    old = ("			negshiftcands[i].clear();\n"
           "			negshiftcands[i].insert(bestcands.begin()->cands.begin(), bestcands.begin()->cands.end());")
    new = (old + '\n			if (getenv("REFTRACE7"))\n'
           '				for (auto& bc : negshiftcands[i])\n'
           '					fprintf(stderr, "WIN %d %d %lf %d\\n", (int) i,'
           ' bc.get<0>()->n, bc.get<1>(), bc.get<2>());')
    if src.count(old) != 1:
        raise SystemExit(f"win anchor count={src.count(old)}")
    src = src.replace(old, new)
    # (j) REFTRACE8: processinfprobs per-allele capped-GD results.
    old = ("		double intended = cappedgd(gradient, curprob, epsilon, hitnnn);\n"
           "		ind->infprobs[j][side][probpair.first] = intended;")
    new = ("		double intended = cappedgd(gradient, curprob, epsilon, hitnnn);\n"
           '		if (getenv("REFTRACE8")) fprintf(stderr,'
           ' "PIP %d %d %d %d %.17g %.17g %.17g %.17g\\n", ind->n, (int) j,'
           ' side, probpair.first.value(), curprob, probpair.second, sum,'
           ' intended);\n'
           "		ind->infprobs[j][side][probpair.first] = intended;")
    if src.count(old) != 1:
        raise SystemExit(f"pip anchor count={src.count(old)}")
    src = src.replace(old, new)
    # (k) REFTRACE9: the relskew clause reweighting ingredients.
    old = ("					omp_set_lock(&markerlocks[marker]);\n"
           "					for (clause& c : toulInput[marker])")
    new = ('					if (getenv("REFTRACE9")) fprintf(stderr,'
           ' "SKW %d %d %.17g %d\\n", dous[j]->n, marker, w,'
           ' dous[j]->descendants);\n' + old)
    if src.count(old) != 1:
        raise SystemExit(f"skw anchor count={src.count(old)}")
    src = src.replace(old, new)
    return src


def patch_settings(settings: str, variant: str) -> str:
    """Select a settings.h model block the way the reference intends —
    by editing the compile-time constants (settings.h:14-23).

    The SELFING / RELSKEWSTATES variants extend TYPESEXES/TYPEGENS with
    the entries the reference keeps commented next to the arrays
    (settings.h:21-23: ``/*, 0, 0*/`` selfing sexes, ``/*, 2, 2*/``
    selfing gens, ``/*, 0*/`` the relskew coherence bit)."""
    settings = settings.replace("#define XSTDBITSET 1",
                                "#define XSTDBITSET 0")
    if variant == "default":
        return settings
    sexes = ("const int TYPESEXES[TYPEBITS + SELFING * SELFBITS + "
             "RELSKEWSTATES] = { 0, 0, 1, 1, 0, 1/*, 0, 0*//*, 0*/ };")
    gens = ("const int TYPEGENS[TYPEBITS + SELFING * 2] = "
            "{ 1, 0, 0, 1, 0, 0/*, 2, 2*//*, 3*/ };")
    assert sexes in settings and gens in settings, \
        "settings.h array anchors moved"
    if variant == "selfing":
        settings = settings.replace("const bool SELFING = false;",
                                    "const bool SELFING = true;")
        settings = settings.replace(
            sexes, sexes.replace("0, 1/*, 0, 0*//*, 0*/",
                                 "0, 1, 0, 0"))
        settings = settings.replace(
            gens, gens.replace("0, 0/*, 2, 2*//*, 3*/",
                               "0, 0, 2, 2"))
    elif variant == "relskewstates":
        settings = settings.replace("const bool RELSKEWSTATES = false;",
                                    "const bool RELSKEWSTATES = true;")
        settings = settings.replace(
            sexes, sexes.replace("0, 1/*, 0, 0*//*, 0*/",
                                 "0, 1, 0"))
    else:
        raise SystemExit(f"unknown variant {variant}")
    return settings


def build(variant: str = "default") -> str:
    """Patch + compile one settings variant; returns the binary path."""
    suffix = "" if variant == "default" else "_" + variant
    out = OUT + suffix
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(REF, "cnF2freq.cpp")) as f:
        src = f.read()
    with open(os.path.join(REF, "settings.h")) as f:
        settings = f.read()

    src = patch_source(src)
    settings = patch_settings(settings, variant)

    with open(os.path.join(out, "cnF2freq.cpp"), "w") as f:
        f.write(src)
    with open(os.path.join(out, "settings.h"), "w") as f:
        f.write(settings)

    binary = "cnf2freq_ref" + suffix
    cmd = [
        "g++", "cnF2freq.cpp", "-O2", "-ffast-math", "-fopenmp",
        "-I", os.path.join(REPO, "refbaseline", "include"),
        "-std=gnu++20", "-DDOEXTERNFORGCC", "-w",
        "-o", binary,
    ]
    print("+", " ".join(cmd))
    subprocess.run(cmd, cwd=out, check=True)
    return os.path.join(out, binary)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "default"
    build(variant)


if __name__ == "__main__":
    main()
