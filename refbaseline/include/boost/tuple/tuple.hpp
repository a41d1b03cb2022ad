// boost::tuple subset: member get<N>(), make_tuple, lexicographic compare.
#pragma once
#include <tuple>

namespace boost {

template <class... Ts>
struct tuple {
    std::tuple<Ts...> t;

    tuple() = default;
    tuple(const Ts&... args) : t(args...) {}

    template <int N>
    auto& get() { return std::get<N>(t); }
    template <int N>
    const auto& get() const { return std::get<N>(t); }

    friend bool operator<(const tuple& a, const tuple& b) { return a.t < b.t; }
    friend bool operator==(const tuple& a, const tuple& b) { return a.t == b.t; }
    friend bool operator!=(const tuple& a, const tuple& b) { return a.t != b.t; }
    friend bool operator>(const tuple& a, const tuple& b) { return b.t < a.t; }
};

template <class... Ts>
tuple<Ts...> make_tuple(const Ts&... args)
{
    return tuple<Ts...>(args...);
}

template <int N, class... Ts>
auto& get(tuple<Ts...>& t) { return std::get<N>(t.t); }
template <int N, class... Ts>
const auto& get(const tuple<Ts...>& t) { return std::get<N>(t.t); }

}  // namespace boost
