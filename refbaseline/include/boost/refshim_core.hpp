// Minimal stand-ins for the boost facilities cnF2freq uses, written from
// the documented public boost APIs (no boost source consulted or copied).
// Only the exact surface exercised by cnF2freq.cpp is provided.
#pragma once
#include <string>
#include <sstream>
#include <utility>

namespace boost {

// boost::lexical_cast — the reference uses number->string and string->number.
template <class Target, class Source>
Target lexical_cast(const Source& src)
{
    std::stringstream ss;
    ss << src;
    Target out{};
    ss >> out;
    return out;
}

template <>
inline std::string lexical_cast<std::string, long long>(const long long& src)
{
    return std::to_string(src);
}

template <>
inline std::string lexical_cast<std::string, int>(const int& src)
{
    return std::to_string(src);
}

// boost::make_iterator_range — used once for range-for over a
// std::multimap equal_range result pair.
template <class It>
struct iterator_range_shim {
    It first, second;
    It begin() const { return first; }
    It end() const { return second; }
};

template <class It>
iterator_range_shim<It> make_iterator_range(It a, It b)
{
    return {a, b};
}

}  // namespace boost
