// boost::math::quadrature::gauss<double, 15>::integrate(f, a, b) stand-in.
// Fixed 15-point Gauss-Legendre rule; nodes/weights computed with
// numpy.polynomial.legendre.leggauss(15).
#pragma once
#include <cstddef>

namespace boost { namespace math { namespace quadrature {

template <class Real, unsigned N>
struct gauss;

template <class Real>
struct gauss<Real, 15> {
    template <class F>
    static Real integrate(const F& f, Real a, Real b)
    {
        static const Real nw[15][2] = {
            {-9.87992518020485377e-01, 3.07532419961186465e-02},
            {-9.37273392400705951e-01, 7.03660474881080689e-02},
            {-8.48206583410427206e-01, 1.07159220467171773e-01},
            {-7.24417731360170070e-01, 1.39570677926153908e-01},
            {-5.70972172608538830e-01, 1.66269205816993781e-01},
            {-3.94151347077563385e-01, 1.86161000015561878e-01},
            {-2.01194093997434514e-01, 1.98431485327111246e-01},
            {0.00000000000000000e+00, 2.02578241925560898e-01},
            {2.01194093997434514e-01, 1.98431485327111246e-01},
            {3.94151347077563385e-01, 1.86161000015561878e-01},
            {5.70972172608538830e-01, 1.66269205816993781e-01},
            {7.24417731360170070e-01, 1.39570677926153908e-01},
            {8.48206583410427206e-01, 1.07159220467171773e-01},
            {9.37273392400705951e-01, 7.03660474881080689e-02},
            {9.87992518020485377e-01, 3.07532419961186465e-02},
        };
        const Real mid = (a + b) / 2;
        const Real half = (b - a) / 2;
        Real sum = 0;
        for (int i = 0; i < 15; i++)
            sum += nw[i][1] * f(mid + half * nw[i][0]);
        return sum * half;
    }
};

// The gauss_kronrod form appears only in a comment at HEAD; declared for
// completeness.
template <class Real, unsigned N>
struct gauss_kronrod;

}}}  // namespace boost::math::quadrature
