// Drop-in stand-in for the `toulbar2` weighted-MaxSAT solver binary that
// cnF2freq spawns per marker (cnF2freq.cpp:6078-6084). The container has no
// toulbar2; this shim solves the same problem: given a WCNF file (clauses =
// weighted disjunctions of +/- integer literals), find an assignment
// minimizing the total weight of violated clauses, and write the 0/1
// assignment for variables 1..nbvar to the file given by -w=<path>
// (cnF2freq reads that file back, cnF2freq.cpp:6088-6096).
//
// cnF2freq's instances decompose: each clause covers <=8 family members, and
// families couple only through shared ancestors. We split into connected
// components, solve small components exactly (<= MAXEXACT vars) and larger
// ones by iterated conditional modes from the all-zero start (matching
// toulbar2's role as a heuristic improver there). All other toulbar2 flags
// (-p/-O/-m/-s) are accepted and ignored.
//
// Usage: toulbar2 <input.wcnf> [flags...] -w=<solution-file>
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <numeric>
#include <sstream>
#include <string>
#include <vector>

struct Clause {
    long long weight;
    std::vector<int> lits;
};

static int find_root(std::vector<int>& up, int x)
{
    while (up[x] != x) {
        up[x] = up[up[x]];
        x = up[x];
    }
    return x;
}

int main(int argc, char** argv)
{
    std::string infile, solfile;
    for (int i = 1; i < argc; i++) {
        std::string a = argv[i];
        if (a.rfind("-w=", 0) == 0)
            solfile = a.substr(3);
        else if (a[0] != '-' && infile.empty())
            infile = a;
    }
    if (infile.empty() || solfile.empty()) {
        fprintf(stderr, "toulbar2 shim: need <input.wcnf> and -w=<sol>\n");
        return 1;
    }

    std::ifstream in(infile);
    if (!in) {
        fprintf(stderr, "toulbar2 shim: cannot open %s\n", infile.c_str());
        return 1;
    }

    int nbvar = 0;
    std::vector<Clause> clauses;
    std::string line;
    while (std::getline(in, line)) {
        if (line.empty() || line[0] == 'c') continue;
        if (line[0] == 'p') {
            std::istringstream ls(line);
            std::string p, wcnf;
            long long nc;
            ls >> p >> wcnf >> nbvar >> nc;
            continue;
        }
        std::istringstream ls(line);
        Clause c;
        if (!(ls >> c.weight)) continue;
        long long lit;
        while (ls >> lit && lit != 0) c.lits.push_back((int)lit);
        // dedupe literals; drop tautologies (+v and -v in one clause)
        std::sort(c.lits.begin(), c.lits.end(), [](int a, int b) {
            return std::abs(a) != std::abs(b) ? std::abs(a) < std::abs(b) : a < b;
        });
        c.lits.erase(std::unique(c.lits.begin(), c.lits.end()), c.lits.end());
        bool taut = false;
        for (size_t k = 0; k + 1 < c.lits.size(); k++)
            if (c.lits[k] == -c.lits[k + 1]) taut = true;
        if (!c.lits.empty() && !taut) clauses.push_back(std::move(c));
    }

    // Union-find over variables sharing a clause.
    std::vector<int> up(nbvar + 1);
    std::iota(up.begin(), up.end(), 0);
    for (const Clause& c : clauses) {
        int r0 = find_root(up, std::abs(c.lits[0]));
        for (size_t k = 1; k < c.lits.size(); k++)
            up[find_root(up, std::abs(c.lits[k]))] = r0;
    }

    std::map<int, std::vector<int>> comp_clauses;  // root -> clause indices
    for (size_t ci = 0; ci < clauses.size(); ci++)
        comp_clauses[find_root(up, std::abs(clauses[ci].lits[0]))].push_back((int)ci);

    std::vector<uint8_t> assign(nbvar + 1, 0);

    const int MAXEXACT = 22;
    for (auto& [root, cls] : comp_clauses) {
        // collect component vars
        std::vector<int> vars;
        for (int ci : cls)
            for (int lit : clauses[ci].lits) vars.push_back(std::abs(lit));
        std::sort(vars.begin(), vars.end());
        vars.erase(std::unique(vars.begin(), vars.end()), vars.end());
        std::map<int, int> vidx;
        for (size_t k = 0; k < vars.size(); k++) vidx[vars[k]] = (int)k;

        auto cost_of = [&](uint64_t bits) {
            long long cost = 0;
            for (int ci : cls) {
                bool violated = true;
                for (int lit : clauses[ci].lits) {
                    bool val = (bits >> vidx[std::abs(lit)]) & 1;
                    if ((lit > 0 && val) || (lit < 0 && !val)) {
                        violated = false;
                        break;
                    }
                }
                if (violated) cost += clauses[ci].weight;
            }
            return cost;
        };

        if ((int)vars.size() <= MAXEXACT) {
            uint64_t best = 0;
            long long bestcost = cost_of(0);
            for (uint64_t bits = 1; bits < (1ull << vars.size()); bits++) {
                long long c = cost_of(bits);
                if (c < bestcost) {
                    bestcost = c;
                    best = bits;
                }
            }
            for (size_t k = 0; k < vars.size(); k++)
                assign[vars[k]] = (best >> k) & 1;
        } else {
            // Incremental ICM from all-zero until fixpoint. A clause is
            // violated iff all its literals are false; track per-clause
            // false-literal counts and update only the clauses touching the
            // flipped variable.
            std::vector<uint8_t> val(vars.size(), 0);
            std::vector<int> nfalse(cls.size());
            std::vector<std::vector<std::pair<int, int>>> var2cl(vars.size());
            for (size_t w = 0; w < cls.size(); w++) {
                const Clause& c = clauses[cls[w]];
                int nf = 0;
                for (int lit : c.lits) {
                    int k = vidx[std::abs(lit)];
                    // all-zero start: literal +v false, -v true
                    if (lit > 0) nf++;
                    var2cl[k].push_back({(int)w, lit > 0 ? 1 : -1});
                }
                nfalse[w] = nf;
            }
            auto flip_delta = [&](int k) {
                long long d = 0;
                for (auto [w, sign] : var2cl[k]) {
                    const Clause& c = clauses[cls[w]];
                    int len = (int)c.lits.size();
                    // flipping k toggles the falseness of its literal(s)
                    // in clause w; sign>0 means literal +v (false when
                    // val==0), sign<0 means -v (false when val==1).
                    int was_false = (sign > 0) ? !val[k] : val[k];
                    int delta_nf = was_false ? -1 : 1;
                    int nf_new = nfalse[w] + delta_nf;
                    if (nfalse[w] == len && nf_new != len) d -= c.weight;
                    if (nfalse[w] != len && nf_new == len) d += c.weight;
                }
                return d;
            };
            auto apply_flip = [&](int k) {
                for (auto [w, sign] : var2cl[k]) {
                    int was_false = (sign > 0) ? !val[k] : val[k];
                    nfalse[w] += was_false ? -1 : 1;
                }
                val[k] ^= 1;
            };
            bool improved = true;
            while (improved) {
                improved = false;
                for (size_t k = 0; k < vars.size(); k++) {
                    if (flip_delta((int)k) < 0) {
                        apply_flip((int)k);
                        improved = true;
                    }
                }
            }
            for (size_t k = 0; k < vars.size(); k++) assign[vars[k]] = val[k];
        }
    }

    std::ofstream sol(solfile);
    for (int v = 1; v <= nbvar; v++) sol << (int)assign[v] << (v == nbvar ? '\n' : ' ');
    return 0;
}
