#pragma once
#include <set>
#include <functional>

namespace boost { namespace container {

template <class Key, class Compare = std::less<Key>, class Sequence = void>
using flat_set = std::set<Key, Compare>;

template <class Key, class Compare = std::less<Key>, class Sequence = void>
using flat_multiset = std::multiset<Key, Compare>;

}}  // namespace boost::container
