// boost::math::binomial_distribution + pdf stand-in.
// cnF2freq constructs binomial_distribution<double>(n) for read-count
// genotypes (cnF2freq.cpp:6599-6600): n trials with the boost default
// success fraction 0.5, pdf evaluated at integer k.
#pragma once
#include <cmath>

namespace boost { namespace math {

template <class RealType = double>
class binomial_distribution {
    RealType n_, p_;

public:
    explicit binomial_distribution(RealType n, RealType p = RealType(0.5))
        : n_(n), p_(p) {}
    RealType trials() const { return n_; }
    RealType success_fraction() const { return p_; }
};

template <class RealType>
RealType pdf(const binomial_distribution<RealType>& d, RealType k)
{
    const double n = (double)d.trials();
    const double p = (double)d.success_fraction();
    // log C(n,k) p^k (1-p)^(n-k) via lgamma for stability.
    double logc = std::lgamma(n + 1) - std::lgamma(k + 1) - std::lgamma(n - k + 1);
    double logp = 0;
    if (k > 0) logp += k * std::log(p);
    if (n - k > 0) logp += (n - k) * std::log1p(-p);
    return (RealType)std::exp(logc + logp);
}

template <class RealType>
RealType pdf(const binomial_distribution<RealType>& d, int k)
{
    return pdf(d, (RealType)k);
}

}}  // namespace boost::math
