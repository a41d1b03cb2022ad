// boost::program_options stand-in covering exactly the surface used by
// cnF2freq.cpp:7946-7988: options_description::add_options() chaining,
// value<T>() with ->default_value / ->multitoken / ->notifier, bool_switch,
// command_line_parser, store, notify, variables_map::count / ::as<T>.
// Written against the documented public API; no boost source consulted.
#pragma once
#include <any>
#include <functional>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace boost { namespace program_options {

struct value_semantic {
    virtual ~value_semantic() = default;
    virtual bool is_switch() const { return false; }
    virtual bool is_multitoken() const { return false; }
    // Parse raw tokens into a std::any holding the typed value.
    virtual std::any parse(const std::vector<std::string>& tokens) const = 0;
    virtual bool has_default() const { return false; }
    virtual std::any default_any() const { return {}; }
    // Write the typed value to the bound variable (if any) and fire the
    // notifier (if any).
    virtual void apply(const std::any& v) const = 0;
};

namespace detail {

template <class T>
T parse_one(const std::string& tok)
{
    if constexpr (std::is_same_v<T, std::string>) {
        return tok;
    } else if constexpr (std::is_same_v<T, int>) {
        return std::stoi(tok);
    } else if constexpr (std::is_same_v<T, long>) {
        return std::stol(tok);
    } else if constexpr (std::is_same_v<T, long long>) {
        return std::stoll(tok);
    } else if constexpr (std::is_same_v<T, unsigned>) {
        return (unsigned)std::stoul(tok);
    } else if constexpr (std::is_same_v<T, double>) {
        return std::stod(tok);
    } else if constexpr (std::is_same_v<T, float>) {
        return std::stof(tok);
    } else if constexpr (std::is_same_v<T, bool>) {
        return tok == "1" || tok == "true" || tok == "yes" || tok == "on";
    } else {
        static_assert(!sizeof(T), "unsupported option value type");
    }
}

template <class T>
struct parse_tokens {
    static T go(const std::vector<std::string>& toks)
    {
        if (toks.empty()) throw std::runtime_error("option requires a value");
        return parse_one<T>(toks[0]);
    }
};

template <class E>
struct parse_tokens<std::vector<E>> {
    static std::vector<E> go(const std::vector<std::string>& toks)
    {
        std::vector<E> out;
        for (auto& t : toks) out.push_back(parse_one<E>(t));
        return out;
    }
};

}  // namespace detail

template <class T>
class typed_value : public value_semantic {
    T* store_ = nullptr;
    bool multitoken_ = false;
    bool has_default_ = false;
    T default_{};
    std::function<void(const T&)> notifier_;
    bool switch_ = false;

public:
    explicit typed_value(T* store) : store_(store) {}

    typed_value* default_value(const T& v)
    {
        has_default_ = true;
        default_ = v;
        return this;
    }
    typed_value* multitoken()
    {
        multitoken_ = true;
        return this;
    }
    typed_value* notifier(std::function<void(const T&)> fn)
    {
        notifier_ = std::move(fn);
        return this;
    }
    typed_value* make_switch()
    {
        switch_ = true;
        has_default_ = true;
        return this;
    }

    bool is_switch() const override { return switch_; }
    bool is_multitoken() const override { return multitoken_; }
    bool has_default() const override { return has_default_; }
    std::any default_any() const override { return default_; }

    std::any parse(const std::vector<std::string>& tokens) const override
    {
        if constexpr (std::is_same_v<T, bool>) {
            if (switch_) return true;
        }
        return detail::parse_tokens<T>::go(tokens);
    }

    void apply(const std::any& v) const override
    {
        const T& val = std::any_cast<const T&>(v);
        if (store_) *store_ = val;
        if (notifier_) notifier_(val);
    }
};

template <class T>
typed_value<T>* value(T* store = nullptr)
{
    return new typed_value<T>(store);
}

inline typed_value<bool>* bool_switch(bool* store = nullptr)
{
    auto* v = new typed_value<bool>(store);
    v->make_switch();
    v->default_value(false);
    return v;
}

class options_description {
public:
    struct option {
        std::string name;
        std::shared_ptr<value_semantic> sem;  // null for flag-only entries
        std::string help;
    };
    std::vector<option> options_;

    options_description() = default;
    explicit options_description(const std::string&) {}

    class adder {
        options_description* desc_;

    public:
        explicit adder(options_description* d) : desc_(d) {}
        adder& operator()(const char* name, const value_semantic* sem,
                          const char* help = "")
        {
            desc_->options_.push_back(
                {name, std::shared_ptr<value_semantic>(
                           const_cast<value_semantic*>(sem)),
                 help});
            return *this;
        }
        adder& operator()(const char* name, const char* help)
        {
            desc_->options_.push_back({name, nullptr, help});
            return *this;
        }
    };

    adder add_options() { return adder(this); }

    const option* find(const std::string& name) const
    {
        for (auto& o : options_)
            if (o.name == name) return &o;
        return nullptr;
    }
};

class variable_value {
    std::any v_;

public:
    variable_value() = default;
    explicit variable_value(std::any v) : v_(std::move(v)) {}
    bool empty() const { return !v_.has_value(); }
    const std::any& raw() const { return v_; }
    template <class T>
    const T& as() const
    {
        return std::any_cast<const T&>(v_);
    }
};

class variables_map : public std::map<std::string, variable_value> {
public:
    std::size_t count(const std::string& name) const
    {
        return std::map<std::string, variable_value>::count(name);
    }
    const variable_value& operator[](const std::string& name) const
    {
        static const variable_value empty_value;
        auto it = find(name);
        return it == end() ? empty_value : it->second;
    }
};

struct parsed_options {
    const options_description* desc = nullptr;
    std::vector<std::pair<std::string, std::vector<std::string>>> values;
};

class command_line_parser {
    int argc_;
    char** argv_;
    const options_description* desc_ = nullptr;

public:
    command_line_parser(int argc, char* argv[]) : argc_(argc), argv_(argv) {}
    command_line_parser& options(const options_description& d)
    {
        desc_ = &d;
        return *this;
    }

    parsed_options run()
    {
        if (!desc_) throw std::runtime_error("no options description");
        parsed_options out;
        out.desc = desc_;
        int i = 1;
        auto is_opt = [](const std::string& s) {
            return s.size() > 2 && s[0] == '-' && s[1] == '-';
        };
        while (i < argc_) {
            std::string arg = argv_[i];
            if (!is_opt(arg))
                throw std::runtime_error("unexpected positional argument: " + arg);
            std::string name = arg.substr(2);
            std::vector<std::string> toks;
            auto eq = name.find('=');
            if (eq != std::string::npos) {
                toks.push_back(name.substr(eq + 1));
                name = name.substr(0, eq);
            }
            const options_description::option* opt = desc_->find(name);
            if (!opt) throw std::runtime_error("unknown option --" + name);
            i++;
            bool wants_value = opt->sem && !opt->sem->is_switch();
            if (wants_value && toks.empty()) {
                if (i >= argc_)
                    throw std::runtime_error("option --" + name + " needs a value");
                toks.push_back(argv_[i++]);
                if (opt->sem->is_multitoken()) {
                    while (i < argc_ && !is_opt(argv_[i])) toks.push_back(argv_[i++]);
                }
            }
            out.values.emplace_back(name, std::move(toks));
        }
        return out;
    }
};

inline const options_description*& vm_desc(variables_map& vm)
{
    static std::map<const variables_map*, const options_description*> track;
    return track[&vm];
}

inline void store(const parsed_options& parsed, variables_map& vm)
{
    for (auto& [name, toks] : parsed.values) {
        const auto* opt = parsed.desc->find(name);
        if (opt && opt->sem) {
            std::any prev;
            auto it = vm.find(name);
            if (opt->sem->is_multitoken() && it != vm.end()) {
                // append semantics for repeated multitoken options
                // (cnF2freq passes --hapfiles once; keep it simple: last wins)
            }
            vm.insert_or_assign(name, variable_value(opt->sem->parse(toks)));
        } else {
            vm.insert_or_assign(name, variable_value(std::any(true)));
        }
    }
    // defaults for options not given
    for (auto& opt : parsed.desc->options_) {
        if (opt.sem && opt.sem->has_default() && !vm.count(opt.name))
            vm.insert_or_assign(opt.name, variable_value(opt.sem->default_any()));
    }
    // remember the description for notify()
    vm_desc(vm) = parsed.desc;
}

inline void notify(variables_map& vm)
{
    const options_description* desc = vm_desc(vm);
    if (!desc) return;
    for (auto& opt : desc->options_) {
        if (!opt.sem) continue;
        auto it = vm.find(opt.name);
        if (it == vm.end() || it->second.empty()) continue;
        // parse() and default_any() both produce the typed std::any
        opt.sem->apply(it->second.raw());
    }
}

}}  // namespace boost::program_options
